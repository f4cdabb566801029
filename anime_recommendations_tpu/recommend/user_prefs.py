"""User preference profiling (favorite genres and source material).

Behavior parity with /root/reference/user_prefs/user_prefs.py:
  * favorites = the user's ratings at or above their own
    ``favorite_percentile`` percentile (fave_genres :222-240,
    fave_sources :243-261)
  * favorite rows are returned in CATALOG order (the reference's
    anime_df.isin() selection), carrying eng_version + Genres/Source
  * the merged preferences frame matches
    figure_file/User_ID_153695_user_prefs.csv (index, eng_version, Source,
    Genres)
  * genre/source frequency dicts feed the word clouds (get_genres
    :95-118, get_sources :121-141)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from anime_recommendations_tpu.recommend.context import RecContext


@dataclass
class UserPrefs:
    user_id: int
    genres: pd.DataFrame       # eng_version, Genres (catalog order)
    sources: pd.DataFrame      # eng_version, Source
    merged: pd.DataFrame       # eng_version, Source, Genres
    genre_frequencies: dict[str, int]
    source_frequencies: dict[str, int]


def fave_rows(ctx: RecContext, user_id: int, percentile: float) -> pd.DataFrame:
    """Catalog rows of the user's >= percentile-rated anime.

    Reference selection: anime_df[anime_df.anime_id.isin(top)] — catalog
    (Score-sorted) order, NOT rating order. Computed via the context's
    precomputed per-user rating arrays + catalog position index instead of
    a groupby + whole-catalog isin scan per call (the serve layer calls
    this once per similar user per /user_recs request)."""
    pos = ctx.favorite_positions(user_id, percentile)
    return ctx.catalog.anime.iloc[pos]


def fave_genres(ctx: RecContext, user_id: int, percentile: float = 80.0) -> pd.DataFrame:
    return pd.DataFrame(fave_rows(ctx, user_id, percentile)[["eng_version", "Genres"]])


def fave_sources(ctx: RecContext, user_id: int, percentile: float = 80.0) -> pd.DataFrame:
    return pd.DataFrame(fave_rows(ctx, user_id, percentile)[["eng_version", "Source"]])


def get_fave_df(genres: pd.DataFrame, sources: pd.DataFrame) -> pd.DataFrame:
    """Merged favorites: eng_version, Source, Genres (user_prefs.py:264-279)."""
    merged = sources.copy()
    merged["Genres"] = genres["Genres"]
    return merged


def frequency_dict(col: pd.Series) -> dict[str, int]:
    """Comma-split token counts (user_prefs get_genres/get_sources)."""
    out: dict[str, int] = {}
    for entry in col:
        if isinstance(entry, str):
            for token in entry.split(","):
                token = token.strip()
                out[token] = out.get(token, 0) + 1
    return out


def user_prefs(
    ctx: RecContext, user_id: int, percentile: float = 80.0
) -> UserPrefs:
    rows = fave_rows(ctx, user_id, percentile)
    genres = pd.DataFrame(rows[["eng_version", "Genres"]])
    sources = pd.DataFrame(rows[["eng_version", "Source"]])
    merged = get_fave_df(genres, sources)
    return UserPrefs(
        user_id=user_id,
        genres=genres,
        sources=sources,
        merged=merged,
        genre_frequencies=frequency_dict(genres["Genres"]),
        source_frequencies=frequency_dict(sources["Source"]),
    )
