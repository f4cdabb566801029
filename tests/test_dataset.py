"""Split + batching semantics (neural_network.py:155-169, Keras fit batching)."""

import numpy as np
import pandas as pd

from anime_recommendations_tpu.data.dataset import (
    RatingsDataset,
    shuffle_frame,
    train_holdout_split,
)
from anime_recommendations_tpu.data.vocab import build_vocab, encode_frame


def encoded(ratings_frame):
    df = ratings_frame.copy()
    df["rating"] = df["rating"] / 10.0
    return encode_frame(df, build_vocab(df))[["user", "anime", "rating"]]


def test_split_matches_reference_oracle(ratings_frame):
    df = encoded(ratings_frame)
    test_size = 1000
    train, test = train_holdout_split(df, test_size=test_size, shuffle_seed=42)
    # Oracle: pandas sample(frac=1, random_state=42), last rows held out.
    oracle = df.sample(frac=1, random_state=42)
    X = oracle[["user", "anime"]].to_numpy()
    y = oracle["rating"].to_numpy()
    cut = len(oracle) - test_size
    np.testing.assert_array_equal(train.users, X[:cut, 0])
    np.testing.assert_array_equal(train.anime, X[:cut, 1])
    np.testing.assert_allclose(train.ratings, y[:cut].astype(np.float32))
    np.testing.assert_array_equal(test.users, X[cut:, 0])
    assert len(test) == test_size


def test_batch_iterator_covers_all_rows_once():
    ds = RatingsDataset(
        users=np.arange(25, dtype=np.int32),
        anime=np.arange(25, dtype=np.int32),
        ratings=np.linspace(0, 1, 25).astype(np.float32),
    )
    batches = list(ds.iter_batches(10, shuffle=True, seed=3))
    assert len(batches) == 3
    seen = np.concatenate([b.users[b.weights > 0] for b in batches])
    assert sorted(seen.tolist()) == list(range(25))
    # Final batch padded to static shape with zero weights.
    assert batches[-1].users.shape == (10,)
    assert batches[-1].weights.sum() == 5


def test_drop_remainder():
    ds = RatingsDataset(
        users=np.arange(25, dtype=np.int32),
        anime=np.arange(25, dtype=np.int32),
        ratings=np.zeros(25, np.float32),
    )
    batches = list(ds.iter_batches(10, shuffle=False, drop_remainder=True))
    assert len(batches) == 2
    assert all(b.weights.all() for b in batches)


def test_shuffle_frame_is_pandas_sample():
    df = pd.DataFrame({"a": range(100)})
    out = shuffle_frame(df, seed=42)
    expected = df.sample(frac=1, random_state=42)
    np.testing.assert_array_equal(out["a"].to_numpy(), expected["a"].to_numpy())
