"""Reproducibility: same seed => identical training history and params."""

import jax
import numpy as np

from anime_recommendations_tpu.train.trainer import Trainer
from tests.test_sharded_trainer import make_ds


def run_once(seed):
    train, holdout, n_users, n_anime = make_ds(n=3000, seed=1)
    trainer = Trainer(
        embedding_size=8, batch_size=512, epochs=2, patience=5,
        start_lr=1e-3, max_lr=3e-3, min_lr=1e-3, rampup_epochs=1,
        l2_reg_factor=1e-5, verbose=False, seed=seed,
    )
    return trainer.fit(train, holdout, n_users, n_anime)


def test_same_seed_bitwise_identical():
    a = run_once(7)
    b = run_once(7)
    np.testing.assert_array_equal(
        a.history.to_numpy(), b.history.to_numpy()
    )
    for x, y in zip(jax.tree.leaves(a.state.params), jax.tree.leaves(b.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_different_seed_differs():
    a = run_once(7)
    b = run_once(8)
    assert not np.allclose(a.history["loss"].to_numpy(), b.history["loss"].to_numpy())
