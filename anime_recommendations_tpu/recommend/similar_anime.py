"""Similar-anime retrieval.

Behavior parity with /root/reference/similar_anime/similar_anime.py
anime_recs (:364-471), re-architected TPU-first: the full-scores
np.dot + argsort + O(N) Python enrichment loop becomes one fused Pallas
top-k with type/genre/self filters pushed into the kernel as row masks,
followed by a single vectorized metadata join.

Output schema matches figure_file/anime_similar_to_SilentMöbius.csv:
Name, Similarity, Genres, Sypnopsis, Episodes, Japanese name, Studios,
Premiered, Score, Type, Source, Rating — sorted by Similarity descending.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from anime_recommendations_tpu.ops.topk import cosine_topk
from anime_recommendations_tpu.recommend.context import RecContext
from anime_recommendations_tpu.utils.text import clean_name

OUTPUT_COLUMNS = [
    "Name", "Similarity", "Genres", "Sypnopsis", "Episodes", "Japanese name",
    "Studios", "Premiered", "Score", "Type", "Source", "Rating",
]


def similar_anime(
    ctx: RecContext,
    name: str,
    count: int = 10,
    types: list[str] | None = None,
    genres: list | None = None,
) -> tuple[pd.DataFrame, str, str]:
    """Top-``count`` anime most similar to ``name`` by embedding cosine.

    ``types``/``genres`` of None disable that filter (spec_types /
    an_spec_genres False in the reference).
    Returns (frame, csv_filename, cleaned_name) like anime_recs.
    """
    translated = clean_name(name)
    filename = translated + ".csv"

    anime_id = ctx.catalog.resolve_query(name)
    query_index = ctx.anime_index(anime_id)

    mask = ctx.in_catalog_mask()
    if types is not None:
        mask &= ctx.type_mask(types)
    if genres is not None:
        mask &= ctx.genre_mask(genres)

    vals, idx = cosine_topk(
        ctx.anime_table(),
        ctx.anime_norm[query_index],
        k=min(count, ctx.vocab.n_anime),
        mask=np.asarray(mask),
        exclude=np.asarray([query_index], np.int32),
    )
    vals = np.asarray(vals)[0]
    idx = np.asarray(idx)[0]
    keep = vals > -1e29  # fewer valid rows than k -> trim sentinels
    vals, idx = vals[keep], idx[keep]

    anime_ids = ctx.vocab.anime_ids[idx]
    frame = enrich_anime_rows(ctx, anime_ids, extra={"Similarity": vals})
    frame = frame[OUTPUT_COLUMNS]
    return frame.reset_index(drop=True), filename, translated


def enrich_anime_rows(
    ctx: RecContext, anime_ids: np.ndarray, extra: dict[str, np.ndarray]
) -> pd.DataFrame:
    """Vectorized metadata + synopsis join, replacing the reference's
    per-anime pandas row extraction loop (similar_anime.py:413-455)."""
    rows = ctx.catalog.rows_for_ids(anime_ids).reset_index(drop=True)
    out = pd.DataFrame(
        {
            "anime_id": rows["anime_id"].to_numpy(),
            "Name": rows["Name"].to_numpy(),
            "Genres": rows["Genres"].to_numpy(),
            "Sypnopsis": [ctx.catalog.synopsis_of(int(a)) for a in rows["anime_id"]],
            "Episodes": rows["Episodes"].to_numpy(),
            "Japanese name": rows["japanese_name"].to_numpy(),
            "Studios": rows["Studios"].to_numpy(),
            "Premiered": rows["Premiered"].to_numpy(),
            "Score": rows["Score"].to_numpy(),
            "Type": rows["Type"].to_numpy(),
            "Source": rows["Source"].to_numpy(),
            "Rating": rows["Rating"].to_numpy(),
        }
    )
    for key, values in extra.items():
        out[key] = np.asarray(values)[: len(out)]
    return out
