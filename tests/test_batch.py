"""Batched retrieval parity with the scalar paths."""

import numpy as np
import pytest

from anime_recommendations_tpu.recommend import model_recs, similar_anime
from anime_recommendations_tpu.recommend.batch import (
    model_recs_batch,
    similar_anime_batch,
)
from tests.test_recommend import ctx  # reuse fixture  # noqa: F401


def test_similar_anime_batch_matches_scalar(ctx):  # noqa: F811
    names = [ctx.catalog.anime["Name"].iloc[i] for i in (2, 9, 30)]
    batch = similar_anime_batch(ctx, names, count=6)
    assert len(batch) == 3
    for rec, name in zip(batch, names):
        frame, _, _ = similar_anime(ctx, name, count=6)
        assert rec["names"] == frame["Name"].tolist()
        np.testing.assert_allclose(
            rec["similarities"], frame["Similarity"].to_numpy(), rtol=1e-4
        )


def test_model_recs_batch_matches_scalar(ctx):  # noqa: F811
    uids = [int(ctx.vocab.user_ids[i]) for i in (1, 4, 9)]
    batch = model_recs_batch(ctx, uids, n_recs=5)
    for rec, uid in zip(batch, uids):
        frame, _ = model_recs(ctx, uid, n_recs=5)
        assert rec["names"] == frame["Name"].tolist()
        np.testing.assert_allclose(
            rec["predictions"], frame["Prediction"].to_numpy(), rtol=1e-4
        )
        # No watched anime leak through.
        watched = set(ctx.user_rows(uid)["anime_id"].tolist())
        assert not set(rec["anime_ids"]) & watched


def test_batch_unknown_user_raises(ctx):  # noqa: F811
    with pytest.raises(KeyError):
        model_recs_batch(ctx, [999999999], n_recs=3)


def test_similar_users_batch_matches_scalar(ctx):  # noqa: F811
    from anime_recommendations_tpu.recommend.batch import similar_users_batch
    from anime_recommendations_tpu.recommend.similar_users import similar_users

    uids = [int(ctx.vocab.user_ids[i]) for i in (0, 3, 7)]
    batch = similar_users_batch(ctx, uids, n_users=5)
    for rec, uid in zip(batch, uids):
        frame, _, _ = similar_users(ctx, uid, n_users=5)
        assert rec["similar_users"] == frame["similar_users"].tolist()
        np.testing.assert_allclose(
            rec["similarities"], frame["similarity"].to_numpy(), rtol=1e-4
        )
        assert rec["favorite_animes"] == frame["favorite_animes"].tolist()
        assert uid not in rec["similar_users"]  # self excluded
    slim = similar_users_batch(ctx, uids, n_users=5, include_faves=False)
    assert "favorite_animes" not in slim[0]
