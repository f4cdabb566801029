"""Preprocess parity tests (reference preprocess.py:13-117 semantics)."""

import numpy as np
import pandas as pd
import pytest

from anime_recommendations_tpu.data.preprocess import (
    drop_half_watched,
    drop_useless,
    preprocess_ratings,
    scale_ratings,
)


def make_df():
    return pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3, 3, 3, 3, 1],
            "anime_id": [10, 11, 12, 10, 11, 10, 11, 12, 13, 10],
            "rating": [5, 6, 7, 8, 9, 1, 2, 3, 4, 5],
            "watching_status": [2, 2, 6, 2, 2, 2, 6, 2, 2, 2],
            "watched_episodes": [0, 5, 3, 10, 2, 4, 0, 1, 9, 0],
        }
    )


def test_drop_useless_dedupes_and_filters_min_reviews():
    df = make_df()
    # Row 9 duplicates row 0 -> deduped; with num_reviews=4 only user 3
    # (4 ratings) and user 1 (3 after dedupe -> dropped) remain.
    out = drop_useless(df, num_reviews=4)
    assert set(out["user_id"]) == {3}
    out2 = drop_useless(df, num_reviews=3)
    assert set(out2["user_id"]) == {1, 3}


def test_drop_useless_optional_filters():
    df = make_df().drop_duplicates()
    out = drop_useless(df, num_reviews=1, drop_unwatched=True)
    assert (out["watched_episodes"] != 0).all()
    out = drop_useless(df, num_reviews=1, drop_plan=True)
    assert (out["watching_status"] != 6).all()


def test_drop_half_watched_oracle():
    df = pd.DataFrame(
        {
            "user_id": [1, 2, 3, 4, 5, 6],
            "anime_id": [100, 100, 100, 200, 200, 300],
            "rating": [5] * 6,
            "watching_status": [2] * 6,
            "watched_episodes": [10, 4, 6, 1, 1, 0],
        }
    )
    out = drop_half_watched(df)
    # anime 100: max=10, half=5 -> keep watched>=5 (10, 6)
    # anime 200: max=1 (single-episode rule) -> keep watched>=1 (both)
    # anime 300: max=0 -> half=0 -> keep watched>=0
    assert set(zip(out["user_id"], out["anime_id"])) == {
        (1, 100), (3, 100), (4, 200), (5, 200), (6, 300),
    }


def test_scale_ratings_minmax():
    df = pd.DataFrame({"rating": [1, 10, 5]})
    out = scale_ratings(df)
    np.testing.assert_allclose(out["rating"], [0.0, 1.0, 4 / 9])
    assert out["rating"].dtype == np.float64


def test_scale_ratings_constant_column():
    df = pd.DataFrame({"rating": [7, 7]})
    out = scale_ratings(df)
    np.testing.assert_allclose(out["rating"], [0.0, 0.0])


def test_full_pipeline_on_synth(ratings_frame):
    out, stats = preprocess_ratings(ratings_frame, num_reviews=50)
    assert stats.rows_in == len(ratings_frame)
    assert stats.rows_out == len(out)
    assert out["rating"].min() == 0.0 and out["rating"].max() == 1.0
    counts = out["user_id"].value_counts()
    assert (counts >= 50).all()
    # Raw min/max recorded for descaling.
    assert stats.min_rating >= 1 and stats.max_rating <= 10


def test_pipeline_matches_reference_order_of_operations():
    # The min-reviews filter must run BEFORE half-watched dropping and
    # scaling (preprocess.py go(): drop_useless -> drop_half_watched ->
    # scale_ratings).
    df = make_df()
    out, _ = preprocess_ratings(df, num_reviews=3, half_watched=True)
    assert "max_eps" not in out.columns
    assert out["rating"].between(0, 1).all()
