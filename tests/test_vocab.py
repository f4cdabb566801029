"""Vocab parity: first-appearance enumeration (neural_network.py:43-52)."""

import numpy as np
import pandas as pd

from anime_recommendations_tpu.data.vocab import Vocab, build_vocab, encode_frame


def reference_vocab(df):
    """Verbatim reference idiom as the oracle."""
    user_ids = df["user_id"].unique().tolist()
    anime_ids = df["anime_id"].unique().tolist()
    user_to_index = {x: i for i, x in enumerate(user_ids)}
    anime_to_index = {x: i for i, x in enumerate(anime_ids)}
    return user_to_index, anime_to_index


def test_first_appearance_order(ratings_frame):
    vocab = build_vocab(ratings_frame)
    u_ref, a_ref = reference_vocab(ratings_frame)
    assert vocab.user_to_index() == u_ref
    assert vocab.anime_to_index() == a_ref


def test_encode_matches_pandas_map(ratings_frame):
    vocab = build_vocab(ratings_frame)
    u_ref, a_ref = reference_vocab(ratings_frame)
    enc = encode_frame(ratings_frame, vocab)
    np.testing.assert_array_equal(
        enc["user"].to_numpy(), ratings_frame["user_id"].map(u_ref).to_numpy()
    )
    np.testing.assert_array_equal(
        enc["anime"].to_numpy(), ratings_frame["anime_id"].map(a_ref).to_numpy()
    )


def test_unknown_ids_encode_to_minus_one():
    df = pd.DataFrame({"user_id": [5, 9, 5], "anime_id": [2, 2, 3]})
    vocab = build_vocab(df)
    assert vocab.encode_users(np.array([5, 9, 77])).tolist() == [0, 1, -1]
    assert vocab.encode_anime(np.array([3, 4])).tolist() == [1, -1]


def test_save_load_roundtrip(tmp_path, ratings_frame):
    vocab = build_vocab(ratings_frame)
    path = tmp_path / "vocab.json"
    vocab.save(path)
    loaded = Vocab.load(path)
    np.testing.assert_array_equal(vocab.user_ids, loaded.user_ids)
    np.testing.assert_array_equal(vocab.anime_ids, loaded.anime_ids)
