"""Accuracy-parity harness: planted-teacher convergence at reference scale.

The reference's published accuracy baseline is its training history on the
7M-row MyAnimeList parquet (train MSE 0.05074 / val MSE 0.07199 at epoch 14
— /root/reference/figure_file/anime_nn_history.csv row 14,
/root/reference/README.md:88). That parquet is stripped from the repo
(data/.MISSING_LARGE_BLOBS), so exact-number parity cannot be measured.
This harness provides the honest substitute: synthetic ratings with a
PLANTED low-rank teacher (data/synthetic.py) at the reference's trained
scale — 91,641 x 128 user table, 17,560 x 128 anime table, 7M interactions
(/root/reference/similar_anime/similar_anime.py:156,165 shape comments) —
trained with the reference's exact hyperparameters (emb 128, batch 10,000,
Adam, BCE loss, trapezoid LR schedule, <=20 epochs, patience 3, 10k
holdout; /root/reference/config/config.yaml:54-89). Because the teacher is
known, two claims become *measurable* instead of asserted:

  1. CONVERGENCE: best val-MSE reaches the Monte-Carlo-estimated noise
     floor of the generative process (the MSE of the Bayes-optimal
     predictor E[rating | user, anime]) within a small multiple.
  2. RANKING RECOVERY: model_recs' scoring path (ops/scoring) recovers the
     teacher's top-k unwatched anime for well-observed probe users — value-
     level evidence the trained tables are usable for retrieval, not just
     loss-minimizing.

Ranking recovery is measured against TWO oracles, because the model class
itself bounds what is recoverable. The reference's head is
``Dot(normalize=True)`` (/root/reference/neural_network/neural_network.py:90-93)
— a cosine: it L2-normalizes both embeddings, so per-user ranking can only
depend on the *direction* of each item vector, never its magnitude. The
planted teacher ranks by unnormalized ``u . v``; items with large ``||v||``
outrank direction-aligned ones in a way NO cosine two-tower (ours or the
reference's) can express. Measured at reference scale (91,641 x 17,560,
latent 16, seed 0): ranking by the teacher's own *normalized* factors —
perfect direction learning, the architecture's ceiling — only overlaps the
raw-teacher top-10 at **0.275**, and its top-200 captures the teacher top-10
at 0.975 recall. The harness therefore reports:

  * ``topk_overlap``            model top-k vs raw-teacher top-k, with
    ``arch_ceiling_overlap``    the normalized-factor oracle's overlap on
                                the same probes (the model-class ceiling);
  * ``expressible_overlap``     model top-k vs the *expressible* oracle
                                (teacher ranking by normalized item factors
                                — ceiling 1.0 by construction);
  * ``topk_recall``             fraction of raw-teacher top-k found in the
    model top-``recall_K``, with ``recall_ceiling`` the oracle's recall at
    the same K — the candidate-generation claim that actually matters for
    a recommender surface.

Deviation from the reference pipeline, documented: the >=400-ratings user
filter (preprocess.py:37-39) is skipped (num_reviews=0). The reference's
91,641-user trained table *already is* the post-filter population of its
350K-user raw set; synthesizing a raw set that filters down to exactly the
reference's shape would just burn memory. The parity targets are the
trained-table shapes and the interaction count, which match exactly.

Run the archived full-scale result:
    python -m anime_recommendations_tpu.train.convergence --scale reference
CI runs the same harness at small scale (tests/test_convergence.py).
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path

import jax
import numpy as np
import pandas as pd

from anime_recommendations_tpu.data import synthetic
from anime_recommendations_tpu.data.dataset import RatingsDataset, train_holdout_split
from anime_recommendations_tpu.data.preprocess import drop_useless, scale_ratings
from anime_recommendations_tpu.data.vocab import Vocab, build_vocab, encode_frame
from anime_recommendations_tpu.models.two_tower import BNState, TwoTowerParams
from anime_recommendations_tpu.train.trainer import Trainer


@dataclass(frozen=True)
class ConvergenceSpec:
    # Data scale (reference: 91,641 users x 17,560 anime x 7M rows).
    n_users: int
    n_anime: int
    n_interactions: int
    latent_dim: int = 16
    noise: float = 0.35
    data_seed: int = 0
    # Reference training hyperparameters (config.yaml:54-89).
    embedding_size: int = 128
    batch_size: int = 10_000
    epochs: int = 20
    test_size: int = 10_000
    train_seed: int = 0
    optimizer: str = "adam"     # exact Keras-parity Adam for the parity claim
    device_loop: bool = True
    # LR schedule. Defaults are the reference's exact values; the CI scale
    # overrides them because its optimizer-step count is ~50x smaller than
    # the reference's (~700 steps/epoch on 7M rows) and Adam's total
    # parameter movement is ~ lr * steps — at reference LRs a CI-sized run
    # never leaves the init basin.
    start_lr: float = 1e-5
    max_lr: float = 5e-5
    min_lr: float = 1e-5
    # Evaluation.
    n_probe_users: int = 100    # heaviest raters; tail users are under-observed
    k: int = 10                 # model_recs default top-10
    recall_K: int = 200         # candidate-list size for the recall claim
    mc_draws: int = 256         # noise-floor Monte Carlo draws per holdout pair
    # "cosine" = reference-parity head. "dot" = the unnormalized-dot
    # diagnostic (two_tower.dot_merge) for attributing the floor-ratio gap
    # to the cosine head's expressiveness vs optimization; forces the
    # per-step trainer path and skips the ranking-recovery metrics (whose
    # scoring path is the production cosine head).
    merge: str = "cosine"


REFERENCE_SCALE = ConvergenceSpec(
    n_users=91_641, n_anime=17_560, n_interactions=7_000_000
)
# Small enough for CPU CI, large enough that the floor/overlap claims bind:
# ~130 ratings per user on average; batch 2,000 -> ~100 steps/epoch, LR
# scaled up to compensate for the 50x-smaller step count (see spec note).
CI_SCALE = ConvergenceSpec(
    n_users=1_500, n_anime=400, n_interactions=200_000,
    test_size=5_000, n_probe_users=50, epochs=20, batch_size=2_000,
    start_lr=2e-4, max_lr=1e-3, min_lr=2e-4, recall_K=50,
)


@dataclass
class ConvergenceReport:
    spec: ConvergenceSpec
    history: pd.DataFrame
    best_epoch: int
    best_val_loss: float
    best_val_mse: float
    noise_floor_mse: float
    floor_ratio: float          # best_val_mse / noise_floor_mse
    topk_overlap: float         # mean |model top-k ∩ raw-teacher top-k| / k
    arch_ceiling_overlap: float  # normalized-factor oracle vs raw teacher
    expressible_overlap: float   # model vs the expressible (cosine) oracle
    topk_recall: float           # raw-teacher top-k found in model top-K
    recall_ceiling: float        # same, for the expressible oracle
    n_users_trained: int
    n_anime_trained: int
    examples_per_sec: float
    train_seconds: float

    def summary(self) -> dict:
        d = asdict(self)
        d.pop("history")
        d["spec"] = asdict(self.spec)
        return d


def _teacher_rows(vocab: Vocab) -> tuple[np.ndarray, np.ndarray]:
    """Map dense vocab rows back to planted-factor rows via the documented
    affine raw-id layout (synthetic.py USER_ID_STRIDE etc.)."""
    u = (vocab.user_ids - synthetic.USER_ID_BASE) // synthetic.USER_ID_STRIDE
    a = (vocab.anime_ids - synthetic.ANIME_ID_BASE) // synthetic.ANIME_ID_STRIDE
    return u.astype(np.int64), a.astype(np.int64)


def _scaled_rating_draws(
    affinity: np.ndarray, lo: float, hi: float, noise: float,
    n_draws: int, rng: np.random.Generator,
) -> np.ndarray:
    """[P, n_draws] samples of the preprocessed (min-max scaled) rating the
    teacher emits for pairs with the given affinities — the exact generative
    chain of synthetic.synth_ratings + preprocess.scale_ratings."""
    eps = rng.normal(0.0, noise, size=(len(affinity), n_draws))
    score = 1.0 / (1.0 + np.exp(-(affinity[:, None] * synthetic.TEACHER_GAIN + eps)))
    rating = np.clip(np.round(1 + 9 * score), 1, 10)
    return (rating - lo) / max(hi - lo, 1e-12)


def noise_floor_mse(
    holdout: RatingsDataset,
    vocab: Vocab,
    U: np.ndarray,
    V: np.ndarray,
    lo: float,
    hi: float,
    noise: float,
    n_draws: int = 256,
    seed: int = 123,
) -> float:
    """MSE of the Bayes-optimal predictor E[y|u,a] on the holdout pairs,
    estimated by Monte Carlo over the teacher's noise + rounding chain.
    No model can do better in expectation; 'reaching the floor' is the
    strongest convergence claim the synthetic benchmark supports."""
    u_rows, a_rows = _teacher_rows(vocab)
    affinity = np.einsum(
        "ij,ij->i", U[u_rows[holdout.users]], V[a_rows[holdout.anime]]
    )
    rng = np.random.default_rng(seed)
    draws = _scaled_rating_draws(affinity, lo, hi, noise, n_draws, rng)
    y_hat = draws.mean(axis=1)
    return float(np.mean((holdout.ratings.astype(np.float64) - y_hat) ** 2))


@dataclass(frozen=True)
class RecoveryMetrics:
    topk_overlap: float
    arch_ceiling_overlap: float
    expressible_overlap: float
    topk_recall: float
    recall_ceiling: float


def topk_recovery(
    params: TwoTowerParams,
    bn_state: BNState,
    vocab: Vocab,
    encoded: pd.DataFrame,
    U: np.ndarray,
    V: np.ndarray,
    n_probe_users: int,
    k: int,
    recall_K: int,
) -> RecoveryMetrics:
    """Ranking-recovery metrics over the ``n_probe_users`` heaviest raters.

    The model's scores come through the real model_recs scoring path
    (ops/scoring.score_all_items). Three reference rankings per probe user
    (watched anime masked out of all of them):

    * raw teacher  ``t = V @ U[u]`` — the generative ranking;
    * expressible oracle ``o = (V / ||V||) @ U[u]`` — the best ranking any
      cosine two-tower can express (direction-only; see module docstring);
    * the model's own ranking ``m``.
    """
    from anime_recommendations_tpu.ops.scoring import score_all_items

    u_rows, a_rows = _teacher_rows(vocab)
    V_vocab = V[a_rows]  # [n_anime_vocab, latent] — teacher rows in vocab order
    V_unit = V_vocab / np.linalg.norm(V_vocab, axis=1, keepdims=True)
    recall_K = min(recall_K, V_vocab.shape[0] - 1)

    counts = encoded["user"].value_counts()
    probes = counts.index.to_numpy()[:n_probe_users]
    by_user = encoded.groupby("user")["anime"]

    score_fn = jax.jit(score_all_items)
    o_mt, o_ot, o_mo, r_m, r_o = [], [], [], [], []
    for u_dense in probes:
        watched = by_user.get_group(u_dense).to_numpy()
        t = V_vocab @ U[u_rows[u_dense]]
        o = V_unit @ U[u_rows[u_dense]]
        m = np.asarray(score_fn(params, bn_state, int(u_dense)), np.float64)
        t[watched] = o[watched] = m[watched] = -np.inf
        top_t = set(np.argpartition(-t, k)[:k].tolist())
        top_o = set(np.argpartition(-o, k)[:k].tolist())
        top_m = set(np.argpartition(-m, k)[:k].tolist())
        big_m = set(np.argpartition(-m, recall_K)[:recall_K].tolist())
        big_o = set(np.argpartition(-o, recall_K)[:recall_K].tolist())
        o_mt.append(len(top_m & top_t) / k)
        o_ot.append(len(top_o & top_t) / k)
        o_mo.append(len(top_m & top_o) / k)
        r_m.append(len(big_m & top_t) / k)
        r_o.append(len(big_o & top_t) / k)
    return RecoveryMetrics(
        topk_overlap=float(np.mean(o_mt)),
        arch_ceiling_overlap=float(np.mean(o_ot)),
        expressible_overlap=float(np.mean(o_mo)),
        topk_recall=float(np.mean(r_m)),
        recall_ceiling=float(np.mean(r_o)),
    )


def run_convergence(
    spec: ConvergenceSpec, verbose: bool = True, log_fn=print
) -> ConvergenceReport:
    t0 = time.perf_counter()
    if verbose:
        log_fn(
            f"[convergence] generating {spec.n_interactions:,} interactions "
            f"({spec.n_users:,} users x {spec.n_anime:,} anime, "
            f"latent {spec.latent_dim}, noise {spec.noise})"
        )
    df = synthetic.synth_ratings(
        n_users=spec.n_users,
        n_anime=spec.n_anime,
        n_interactions=spec.n_interactions,
        latent_dim=spec.latent_dim,
        seed=spec.data_seed,
        noise=spec.noise,
    )
    U, V, _ = synthetic.planted_factors(
        spec.n_users, spec.n_anime, spec.latent_dim, spec.data_seed
    )

    # Preprocess chain minus the 400-ratings filter (see module docstring);
    # lo/hi captured from the filtered-but-unscaled frame exactly as
    # scale_ratings sees them.
    df = drop_useless(df, num_reviews=0)
    raw = df["rating"].to_numpy()
    lo, hi = float(raw.min()), float(raw.max())
    df = scale_ratings(df)

    vocab = build_vocab(df)
    encoded = encode_frame(df, vocab)
    train, holdout = train_holdout_split(encoded, test_size=spec.test_size)

    trainer = Trainer(
        embedding_size=spec.embedding_size,
        batch_size=spec.batch_size,
        epochs=spec.epochs,
        start_lr=spec.start_lr,
        max_lr=spec.max_lr,
        min_lr=spec.min_lr,
        seed=spec.train_seed,
        optimizer=spec.optimizer,
        device_loop=spec.device_loop and spec.merge == "cosine",
        merge=spec.merge,
        verbose=verbose,
        log_fn=log_fn,
    )
    fit_t0 = time.perf_counter()
    result = trainer.fit(train, holdout, vocab.n_users, vocab.n_anime)
    train_seconds = time.perf_counter() - fit_t0

    floor = noise_floor_mse(
        holdout, vocab, U, V, lo, hi, spec.noise, n_draws=spec.mc_draws
    )
    best_val_mse = float(result.history["val_mse"].iloc[result.best_epoch])
    if spec.merge == "cosine":
        rec = topk_recovery(
            result.state.params, result.state.bn_state, vocab, encoded,
            U, V, spec.n_probe_users, spec.k, spec.recall_K,
        )
    else:
        nan = float("nan")
        rec = RecoveryMetrics(nan, nan, nan, nan, nan)
    report = ConvergenceReport(
        spec=spec,
        history=result.history,
        best_epoch=result.best_epoch,
        best_val_loss=result.best_val_loss,
        best_val_mse=best_val_mse,
        noise_floor_mse=floor,
        floor_ratio=best_val_mse / floor,
        topk_overlap=rec.topk_overlap,
        arch_ceiling_overlap=rec.arch_ceiling_overlap,
        expressible_overlap=rec.expressible_overlap,
        topk_recall=rec.topk_recall,
        recall_ceiling=rec.recall_ceiling,
        n_users_trained=vocab.n_users,
        n_anime_trained=vocab.n_anime,
        examples_per_sec=result.examples_per_sec,
        train_seconds=train_seconds,
    )
    if verbose:
        log_fn(
            f"[convergence] best val_mse {best_val_mse:.5f} (epoch "
            f"{report.best_epoch}) vs noise floor {floor:.5f} -> ratio "
            f"{report.floor_ratio:.3f}; top-{spec.k} overlap "
            f"{rec.topk_overlap:.3f} (arch ceiling "
            f"{rec.arch_ceiling_overlap:.3f}, vs expressible oracle "
            f"{rec.expressible_overlap:.3f}); recall@{spec.recall_K} "
            f"{rec.topk_recall:.3f} (ceiling {rec.recall_ceiling:.3f}); "
            f"total {time.perf_counter() - t0:.0f}s"
        )
    return report


def main(argv: list[str] | None = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scale", choices=["reference", "ci"], default="reference")
    p.add_argument("--out", default="artifacts/convergence")
    p.add_argument(
        "--optimizer", default="adam",
        choices=["adam", "fused_adam", "fused_adam_bf16m", "lazy_adam"],
    )
    p.add_argument("--merge", default="cosine", choices=["cosine", "dot"])
    p.add_argument("--epochs", type=int, default=None,
                   help="diagnostic override of the parity epoch budget")
    p.add_argument("--max-lr", type=float, default=None,
                   help="diagnostic override of the parity peak LR")
    p.add_argument("--tag", default=None,
                   help="artifact tag override (for diagnostic variants)")
    args = p.parse_args(argv)

    spec = REFERENCE_SCALE if args.scale == "reference" else CI_SCALE
    over = {"optimizer": args.optimizer, "merge": args.merge}
    if args.epochs is not None:
        over["epochs"] = args.epochs
    if args.max_lr is not None:
        over["max_lr"] = args.max_lr
    spec = ConvergenceSpec(**{**asdict(spec), **over})
    report = run_convergence(spec)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    tag = args.tag or (args.scale if args.optimizer == "adam" else (
        f"{args.scale}_{args.optimizer}"
    ))
    # Golden history header (",loss,mse,val_loss,val_mse,lr" — the
    # reference's anime_nn_history.csv format).
    report.history.to_csv(out / f"history_{tag}.csv")
    summary = _strict_json(report.summary())
    (out / f"result_{tag}.json").write_text(
        json.dumps(summary, indent=2, allow_nan=False)
    )
    print(json.dumps(summary, allow_nan=False))


def _strict_json(obj):
    """RFC 8259-strict JSON values: NaN/Inf (a probe not applicable to the
    run, e.g. top-k overlap under a diagnostic dot head) become null, and
    numpy scalars become plain floats."""
    import math

    if isinstance(obj, dict):
        return {k: _strict_json(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_strict_json(v) for v in obj]
    if isinstance(obj, (int, str, bool)) or obj is None:
        return obj
    v = float(obj)
    return None if not math.isfinite(v) else v


if __name__ == "__main__":
    main()
