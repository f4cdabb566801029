"""Recommender-layer behavior vs reference-faithful numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from anime_recommendations_tpu.data.catalog import Catalog
from anime_recommendations_tpu.data.preprocess import preprocess_ratings
from anime_recommendations_tpu.data.vocab import build_vocab, encode_frame
from anime_recommendations_tpu.models import two_tower as tt
from anime_recommendations_tpu.recommend import (
    RecContext,
    model_recs,
    similar_anime,
    similar_users,
    user_prefs,
    user_recs,
)
import importlib

up_mod = importlib.import_module("anime_recommendations_tpu.recommend.user_prefs")
from anime_recommendations_tpu.recommend.similar_anime import OUTPUT_COLUMNS as SA_COLS
from anime_recommendations_tpu.recommend.model_recs import OUTPUT_COLUMNS as MR_COLS
from anime_recommendations_tpu.recommend.user_recs import OUTPUT_COLUMNS as UR_COLS


@pytest.fixture(scope="module")
def ctx(ratings_frame, anime_catalog_frame, synopses_frame):
    clean, _ = preprocess_ratings(ratings_frame, num_reviews=50)
    vocab = build_vocab(clean)
    encoded = encode_frame(clean, vocab)
    catalog = Catalog.from_frames(anime_catalog_frame, synopses_frame)
    params = tt.init_params(
        jax.random.PRNGKey(11), vocab.n_users, vocab.n_anime, embedding_size=32
    )
    params = params._replace(dense_w=jnp.float32(2.0), dense_b=jnp.float32(0.1))
    bn = tt.BNState(moving_mean=jnp.float32(0.05), moving_var=jnp.float32(0.8))
    return RecContext.build(params, bn, vocab, catalog, encoded)


def normalized(w):
    w = np.asarray(w)
    return w / np.linalg.norm(w, axis=1, keepdims=True)


# ---------------- similar_anime ----------------


def test_similar_anime_matches_cosine_oracle(ctx):
    name = ctx.catalog.anime["Name"].iloc[5]
    frame, fn, translated = similar_anime(ctx, name, count=8)
    assert list(frame.columns) == SA_COLS
    assert fn == translated + ".csv"
    assert len(frame) == 8

    aid = ctx.catalog.resolve_query(name)
    q = ctx.anime_index(aid)
    W = normalized(ctx.anime_norm)
    dists = W @ W[q]
    in_cat = ctx.in_catalog_mask()
    dists[~in_cat] = -np.inf
    dists[q] = -np.inf
    order = np.argsort(-dists)[:8]
    expected_sims = dists[order]
    np.testing.assert_allclose(frame["Similarity"].to_numpy(), expected_sims, rtol=1e-4)
    # Self must not appear.
    assert ctx.catalog.name_of(aid) not in frame["Name"].iloc[:0].tolist()
    # Descending.
    assert (np.diff(frame["Similarity"].to_numpy()) <= 1e-7).all()


def test_similar_anime_type_filter(ctx):
    name = ctx.catalog.anime["Name"].iloc[3]
    frame, _, _ = similar_anime(ctx, name, count=10, types=["TV"])
    assert set(frame["Type"]) <= {"TV"}


def test_similar_anime_genre_filter(ctx):
    name = ctx.catalog.anime["Name"].iloc[3]
    frame, _, _ = similar_anime(
        ctx, name, count=10, genres=["Action", "None", None]
    )
    keys = frame["Genres"].str.lower().str.replace(" ", "", regex=False)
    assert keys.str.contains("action").all()


def test_similar_anime_invalid_genre_raises(ctx):
    with pytest.raises(ValueError):
        similar_anime(ctx, ctx.catalog.anime["Name"].iloc[0], genres=["NotAGenre", None, None])


def test_similar_anime_name_fallbacks(ctx):
    # Query by irregular-glyph name resolves through cleaning.
    row = ctx.catalog.anime[ctx.catalog.anime["Name"].str.contains("☆")].iloc[0]
    frame, _, _ = similar_anime(ctx, row["Name"], count=3)
    assert len(frame) == 3
    with pytest.raises(KeyError):
        similar_anime(ctx, "definitely not an anime name 123")


# ---------------- similar_users ----------------


def test_similar_users_matches_oracle(ctx):
    uid = int(ctx.vocab.user_ids[7])
    frame, fn, out_uid = similar_users(ctx, uid, n_users=6, num_faves=2, TV_only=True)
    assert fn == f"User_{uid}.csv"
    assert out_uid == uid
    assert list(frame.columns) == ["similar_users", "similarity", "favorite_animes"]
    U = normalized(ctx.user_norm)
    q = ctx.user_index(uid)
    dists = U @ U[q]
    dists[q] = -np.inf
    order = np.argsort(-dists)[:6]
    np.testing.assert_allclose(frame["similarity"].to_numpy(), dists[order], rtol=1e-4)
    np.testing.assert_array_equal(
        frame["similar_users"].to_numpy(), ctx.vocab.user_ids[order]
    )
    assert uid not in frame["similar_users"].tolist()


def test_fave_anime_string_format(ctx):
    uid = int(ctx.vocab.user_ids[0])
    frame, _, _ = similar_users(ctx, uid, n_users=3, num_faves=2, TV_only=True)
    for s in frame["favorite_animes"]:
        # str(list)[1:-1] => quoted, comma-separated names.
        assert s == "" or s.startswith(("'", '"'))


# ---------------- user_prefs ----------------


def test_user_prefs_percentile_oracle(ctx):
    uid = int(ctx.vocab.user_ids[3])
    prefs = user_prefs(ctx, uid, percentile=80.0)
    watched = ctx.ratings[ctx.ratings["user_id"] == uid]
    cut = np.percentile(watched["rating"].to_numpy(), 80.0)
    top_ids = set(watched[watched["rating"] >= cut]["anime_id"].tolist())
    kept = set(
        ctx.catalog.anime[ctx.catalog.anime["anime_id"].isin(list(top_ids))][
            "anime_id"
        ].tolist()
    )
    assert set(
        ctx.catalog.anime.set_index("eng_version")
        .loc[prefs.genres["eng_version"]]["anime_id"]
        .tolist()
    ) == kept
    assert list(prefs.merged.columns) == ["eng_version", "Source", "Genres"]
    # Frequencies count comma-split tokens of the favorites only.
    total = sum(prefs.genre_frequencies.values())
    expected = sum(len(g.split(",")) for g in prefs.genres["Genres"] if isinstance(g, str))
    assert total == expected


# ---------------- user_recs ----------------


def oracle_user_recs(ctx, uid, sim_ids, percentile):
    user_pref = up_mod.fave_rows(ctx, uid, percentile)
    seen = list(user_pref["eng_version"].values)
    collected = []
    for sid in sim_ids:
        prefs = up_mod.fave_rows(ctx, int(sid), percentile)
        prefs = prefs[~prefs["eng_version"].isin(seen)]
        collected.append(prefs["eng_version"].values)
    arr = pd.DataFrame(collected)
    return pd.Series(arr.values.ravel()).value_counts()


def test_user_recs_counting_matches_reference_idiom(ctx):
    uid = int(ctx.vocab.user_ids[2])
    frame_su, _, _ = similar_users(ctx, uid, n_users=8, num_faves=1, TV_only=False)
    sim_ids = frame_su["similar_users"].to_numpy()
    frame, fn = user_recs(ctx, uid, sim_ids, n=10, percentile=80.0)
    assert fn == f"User_ID_{uid}_user_recs.csv"
    assert list(frame.columns) == UR_COLS
    counts = oracle_user_recs(ctx, uid, sim_ids, 80.0)
    # Top counts must agree (ordering among equal counts may differ).
    got = dict(zip(frame["Name"], frame["n_user_prefs"]))
    lookup = ctx.catalog.anime.drop_duplicates("eng_version").set_index("eng_version")
    for name, n_pref in got.items():
        eng = lookup[lookup["Name"] == name].index
        assert counts.loc[eng[0]] == n_pref
    if len(frame) > 1:
        assert (np.diff(frame["n_user_prefs"].to_numpy()) <= 0).all()


def test_user_recs_excludes_own_favorites(ctx):
    uid = int(ctx.vocab.user_ids[2])
    user_pref = up_mod.fave_rows(ctx, uid, 80.0)
    frame, _ = user_recs(
        ctx, uid, ctx.vocab.user_ids[5:12], n=50, percentile=80.0
    )
    assert not set(frame["Name"]) & set(user_pref["Name"])


# ---------------- model_recs ----------------


def test_model_recs_matches_predict_oracle(ctx):
    uid = int(ctx.vocab.user_ids[4])
    frame, fn = model_recs(ctx, uid, n_recs=7)
    assert fn == f"User_ID_{uid}_model_recs.csv"
    assert list(frame.columns) == MR_COLS

    # Oracle: model predict over all anime, mask watched/out-of-catalog.
    params = tt.TwoTowerParams(
        user_emb=jnp.asarray(np.zeros((1, 1))),  # placeholder, not used
        anime_emb=jnp.asarray(np.zeros((1, 1))),
        dense_w=jnp.float32(0), dense_b=jnp.float32(0),
        bn_gamma=jnp.float32(0), bn_beta=jnp.float32(0),
    )
    A = normalized(ctx.anime_norm)
    u = normalized(ctx.user_norm)[ctx.user_index(uid)]
    alpha, beta = np.asarray(ctx.head)
    preds = 1 / (1 + np.exp(-(alpha * (A @ u) + beta)))
    mask = ctx.in_catalog_mask() & ~ctx.watched_mask(uid)
    preds[~mask] = -np.inf
    order = np.argsort(-preds)[:7]
    np.testing.assert_allclose(
        frame["Prediction"].to_numpy(), preds[order], rtol=1e-4
    )
    np.testing.assert_array_equal(
        frame["anime_id"].to_numpy(), ctx.vocab.anime_ids[order]
    )
    # No watched anime in output.
    watched_ids = set(ctx.user_rows(uid)["anime_id"].tolist())
    assert not set(frame["anime_id"].tolist()) & watched_ids


def test_model_recs_score_bounds(ctx):
    uid = int(ctx.vocab.user_ids[4])
    frame, _ = model_recs(ctx, uid, n_recs=20, min_score=6.0, max_score=9.0)
    scores = pd.to_numeric(frame["Score"], errors="coerce")
    assert scores.between(6.0, 9.0).all()


def test_model_recs_type_filter(ctx):
    uid = int(ctx.vocab.user_ids[4])
    frame, _ = model_recs(ctx, uid, n_recs=10, types=["TV", "Movie"])
    assert set(frame["Type"]) <= {"TV", "Movie"}


def test_similar_anime_by_id(ctx):
    aid = int(ctx.catalog.anime["anime_id"].iloc[4])
    frame, fn, _ = similar_anime(ctx, aid, count=3)
    assert len(frame) == 3
    import pytest as _pytest
    with _pytest.raises(KeyError):
        similar_anime(ctx, 99999999, count=3)


def test_fave_anime_percent_tiebreak(ratings_frame, anime_catalog_frame, synopses_frame):
    """watched_episodes tie-break (similar_users.py:234-242): among equally
    max-rated anime, the highest percent-watched wins."""
    import pandas as pd
    from anime_recommendations_tpu.recommend.similar_users import get_fave_anime
    from anime_recommendations_tpu.recommend.context import RecContext
    from anime_recommendations_tpu.data.catalog import Catalog
    from anime_recommendations_tpu.data.vocab import build_vocab, encode_frame
    from anime_recommendations_tpu.models import two_tower as tt

    catalog = Catalog.from_frames(anime_catalog_frame, synopses_frame)
    aid = catalog.anime["anime_id"]
    eps = pd.to_numeric(catalog.anime["Episodes"], errors="coerce")
    two = catalog.anime[eps >= 10].iloc[:2]
    a1, a2 = int(two["anime_id"].iloc[0]), int(two["anime_id"].iloc[1])
    e1, e2 = float(eps[two.index[0]]), float(eps[two.index[1]])
    df = pd.DataFrame({
        "user_id": [1, 1],
        "anime_id": [a1, a2],
        "rating": [1.0, 1.0],                    # tied max rating
        "watched_episodes": [e1, e2 * 0.2],      # a1 fully watched
        "watching_status": [2, 2],
    })
    vocab = build_vocab(df)
    enc = encode_frame(df, vocab)
    params = tt.init_params(jax.random.PRNGKey(0), 1, 2, 8)
    ctx = RecContext.build(params, tt.init_bn_state(), vocab, catalog, enc)
    fave = get_fave_anime(ctx, 1, num_faves=2, TV_only=False)
    # Only the 100%-watched anime survives the percent filter.
    assert catalog.name_of(a1) in fave and catalog.name_of(a2) not in fave


def test_int8_context_matches_f32_results(
    ratings_frame, anime_catalog_frame, synopses_frame, ctx
):
    # An int8-retrieval context must produce the same recommendations as
    # the f32 context (two-stage rescore restores exact scores).
    clean, _ = preprocess_ratings(ratings_frame, num_reviews=50)
    vocab = build_vocab(clean)
    encoded = encode_frame(clean, vocab)
    catalog = Catalog.from_frames(anime_catalog_frame, synopses_frame)
    params = tt.init_params(
        jax.random.PRNGKey(11), vocab.n_users, vocab.n_anime, embedding_size=32
    )
    params = params._replace(dense_w=jnp.float32(2.0), dense_b=jnp.float32(0.1))
    bn = tt.BNState(moving_mean=jnp.float32(0.05), moving_var=jnp.float32(0.8))
    ctx8 = RecContext.build(
        params, bn, vocab, catalog, encoded, retrieval_dtype="int8"
    )
    assert ctx8.anime_qt is not None and ctx8.user_qt is not None

    name = ctx.catalog.anime["Name"].iloc[3]
    f_a, _, _ = similar_anime(ctx, name, count=8)
    q_a, _, _ = similar_anime(ctx8, name, count=8)
    assert list(f_a["Name"]) == list(q_a["Name"])
    np.testing.assert_allclose(
        f_a["Similarity"].to_numpy(), q_a["Similarity"].to_numpy(), rtol=1e-5
    )

    uid = int(ctx.ratings["user_id"].iloc[0])
    f_u, _, _ = similar_users(ctx, uid, n_users=5)
    q_u, _, _ = similar_users(ctx8, uid, n_users=5)
    assert list(f_u["similar_users"]) == list(q_u["similar_users"])

    f_m, _ = model_recs(ctx, uid, n_recs=5)
    q_m, _ = model_recs(ctx8, uid, n_recs=5)
    assert list(f_m["anime_id"]) == list(q_m["anime_id"])
