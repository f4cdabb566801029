from anime_recommendations_tpu.ops.topk import cosine_topk, masked_topk
from anime_recommendations_tpu.ops.normalize import l2_normalize_rows
from anime_recommendations_tpu.ops.scoring import score_all_items, score_topk
from anime_recommendations_tpu.ops.ivf import (
    IVFIndex, add_rows, build_ivf, ivf_topk,
)

__all__ = [
    "cosine_topk",
    "masked_topk",
    "l2_normalize_rows",
    "score_all_items",
    "score_topk",
    "IVFIndex",
    "add_rows",
    "build_ivf",
    "ivf_topk",
]
