"""Similar-users retrieval.

Behavior parity with /root/reference/similar_users/similar_users.py
find_similar_users (:262-314) + get_fave_anime (:203-256), with the cosine
scan running through the fused Pallas kernel (self-exclusion as a kernel
mask instead of post-filtering) and favorite-anime selection vectorized.

Note: the reference's go() crashes as written (get_weights() called with no
model, similar_users.py:322, recorded in SURVEY.md); this implements the
intended behavior.

Output schema matches figure_file/User_153695_similar_users.csv:
similar_users, similarity, favorite_animes — sorted by similarity desc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from anime_recommendations_tpu.ops.topk import cosine_topk
from anime_recommendations_tpu.recommend.context import RecContext

OUTPUT_COLUMNS = ["similar_users", "similarity", "favorite_animes"]


def similar_users(
    ctx: RecContext,
    user_id: int,
    n_users: int = 10,
    num_faves: int = 2,
    TV_only: bool = True,
) -> tuple[pd.DataFrame, str, int]:
    """Top-``n_users`` most similar users plus their favorite anime.

    Returns (frame, csv_filename, user_id) like find_similar_users.
    """
    filename = f"User_{user_id}.csv"
    query_index = ctx.user_index(user_id)

    vals, idx = cosine_topk(
        ctx.user_table(),
        ctx.user_norm[query_index],
        k=min(n_users, ctx.vocab.n_users),
        exclude=np.asarray([query_index], np.int32),
    )
    vals = np.asarray(vals)[0]
    idx = np.asarray(idx)[0]
    keep = vals > -1e29
    vals, idx = vals[keep], idx[keep]

    similar_ids = ctx.vocab.user_ids[idx]
    frame = pd.DataFrame(
        {
            "similar_users": similar_ids,
            "similarity": vals,
            "favorite_animes": [
                get_fave_anime(ctx, int(uid), num_faves, TV_only)
                for uid in similar_ids
            ],
        }
    )
    return frame.reset_index(drop=True), filename, user_id


def get_fave_anime(
    ctx: RecContext, user_id: int, num_faves: int, TV_only: bool
) -> str:
    """A user's favorite anime as a bracket-stripped list string.

    Reference rules (similar_users.py:203-256): take the max-rated anime;
    when watched_episodes data exists, keep only rows with the highest
    percent-of-episodes-watched; if TV_only, order by episode count
    descending; return the first ``num_faves`` names via str(list)[1:-1].
    Anime absent from the catalog are skipped (the reference would crash).
    """
    rows = ctx.user_rows(user_id)
    if len(rows) == 0:
        return ""
    fave = rows[rows["rating"] == rows["rating"].max()]
    meta = ctx.catalog.rows_for_ids(fave["anime_id"].to_numpy())
    fave = fave[fave["anime_id"].isin(meta["anime_id"])]
    if len(fave) == 0:
        return ""
    names = meta["Name"].to_numpy()
    episodes = pd.to_numeric(meta["Episodes"], errors="coerce").to_numpy(np.float32)

    fave = fave.copy()
    fave["name"] = names
    fave["episodes"] = episodes

    if "watched_episodes" in fave.columns:
        percent = fave["watched_episodes"].to_numpy() / fave["episodes"].to_numpy()
        fave["percent"] = percent
        pmax = np.nanmax(percent) if np.any(~np.isnan(percent)) else np.nan
        if not np.isnan(pmax):
            fave = fave[fave["percent"] == pmax]
    if TV_only:
        fave = fave.sort_values(by="episodes", ascending=False)
    all_faves = fave["name"].tolist()
    return str(all_faves[:num_faves])[1:-1]
