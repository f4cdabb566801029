"""Device-resident epoch loop vs the per-step path."""

import numpy as np

from anime_recommendations_tpu.train.trainer import Trainer
from tests.test_sharded_trainer import make_ds


def test_device_loop_matches_per_step_path_without_shuffle():
    # With shuffling disabled both paths see identical batch sequences, so
    # the math must agree to f32 noise.
    train, holdout, n_users, n_anime = make_ds(n=4000, seed=2)
    kwargs = dict(
        embedding_size=8, batch_size=512, epochs=3, patience=5,
        start_lr=1e-3, max_lr=3e-3, min_lr=1e-3, rampup_epochs=1,
        l2_reg_factor=1e-5, verbose=False, shuffle_each_epoch=False,
    )
    per_step = Trainer(**kwargs).fit(train, holdout, n_users, n_anime)
    scanned = Trainer(device_loop=True, **kwargs).fit(
        train, holdout, n_users, n_anime
    )
    np.testing.assert_allclose(
        per_step.history.to_numpy(), scanned.history.to_numpy(), rtol=2e-4
    )


def test_device_loop_converges_with_shuffle():
    train, holdout, n_users, n_anime = make_ds(n=6000, seed=3)
    trainer = Trainer(
        embedding_size=16, batch_size=512, epochs=6, patience=6,
        start_lr=3e-3, max_lr=1e-2, min_lr=3e-3, rampup_epochs=2,
        l2_reg_factor=1e-6, verbose=False, device_loop=True,
    )
    result = trainer.fit(train, holdout, n_users, n_anime)
    hist = result.history
    assert hist["loss"].iloc[-1] < hist["loss"].iloc[0] * 0.98
    assert list(hist.columns) == ["loss", "mse", "val_loss", "val_mse", "lr"]


def test_device_loop_handles_ragged_tail():
    # 1100 rows / batch 512 -> padded tail; loss must be finite and the
    # weighted counts must reflect only real rows.
    train, holdout, n_users, n_anime = make_ds(n=1500, seed=4)
    from anime_recommendations_tpu.data.dataset import RatingsDataset

    small = RatingsDataset(train.users[:1100], train.anime[:1100], train.ratings[:1100])
    trainer = Trainer(
        embedding_size=8, batch_size=512, epochs=1, patience=2,
        start_lr=1e-3, max_lr=1e-3, min_lr=1e-3, rampup_epochs=1,
        l2_reg_factor=0.0, verbose=False, device_loop=True,
    )
    result = trainer.fit(small, holdout, n_users, n_anime)
    assert np.isfinite(result.history["loss"]).all()
