"""Raw-data acquisition.

Replaces /root/reference/download/download.py: the reference streams three
GitHub URLs into W&B artifacts (download.py:36-97) with an optional local
CSV->parquet path (:99-119). Here, local files take priority; URL download
is explicitly gated (this build environment has zero egress); and when no
data exists at all, a schema-identical synthetic dataset is generated so
the full pipeline stays runnable end-to-end (the reference repo ships only
stripped placeholder blobs).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path

import pandas as pd

from anime_recommendations_tpu.config import DataConfig
from anime_recommendations_tpu.data import synthetic

logger = logging.getLogger(__name__)


@dataclass
class RawData:
    ratings: pd.DataFrame
    anime: pd.DataFrame
    synopses: pd.DataFrame
    source: str  # "local" | "download" | "synthetic"


def _read_any(path: Path) -> pd.DataFrame:
    if path.suffix == ".parquet":
        return pd.read_parquet(path)
    if path.suffix == ".csv":
        # Numeric rating dumps (the reference's 2 GB animelist.csv local
        # path, download.py:99-119) go through the native parser; files
        # with string columns fall back to pandas inside.
        from anime_recommendations_tpu.data.fastcsv import read_numeric_csv

        return read_numeric_csv(path)
    return pd.read_csv(path)


def _download(url: str, dest: Path) -> Path:
    import requests

    dest.parent.mkdir(parents=True, exist_ok=True)
    with requests.get(url, stream=True, timeout=60) as resp:
        resp.raise_for_status()
        with open(dest, "wb") as f:
            for chunk in resp.iter_content(chunk_size=1 << 20):
                f.write(chunk)
    return dest


def load_raw(cfg: DataConfig, cache_dir: str | Path = "data") -> RawData:
    """Resolve the three raw inputs: local file > gated download > synthetic."""
    cache = Path(cache_dir)
    paths = {
        "ratings": Path(cfg.stats_path),
        "anime": Path(cfg.anime_path),
        "synopses": Path(cfg.synopses_path),
    }
    urls = {
        "ratings": cfg.stats_url,
        "anime": cfg.anime_url,
        "synopses": cfg.synopses_url,
    }
    frames: dict[str, pd.DataFrame] = {}
    source = "local"
    for key, path in paths.items():
        if path.exists():
            frames[key] = _read_any(path)
        elif cfg.allow_download and urls[key]:
            dest = cache / path.name
            logger.info("downloading %s -> %s", urls[key], dest)
            frames[key] = _read_any(_download(urls[key], dest))
            source = "download"
        else:
            break
    if len(frames) < 3:
        logger.warning(
            "raw data not found (%s) — generating synthetic dataset "
            "(users=%d anime=%d interactions=%d)",
            [str(p) for p in paths.values()],
            cfg.synthetic_users, cfg.synthetic_anime, cfg.synthetic_interactions,
        )
        ratings = synthetic.synth_ratings(
            n_users=cfg.synthetic_users,
            n_anime=cfg.synthetic_anime,
            n_interactions=cfg.synthetic_interactions,
            seed=cfg.synthetic_seed,
        )
        anime = synthetic.synth_anime_catalog(
            n_anime=cfg.synthetic_anime, seed=cfg.synthetic_seed
        )
        synopses = synthetic.synth_synopses(anime, seed=cfg.synthetic_seed)
        return RawData(ratings=ratings, anime=anime, synopses=synopses,
                       source="synthetic")
    return RawData(
        ratings=frames["ratings"],
        anime=frames["anime"],
        synopses=frames["synopses"],
        source=source,
    )
