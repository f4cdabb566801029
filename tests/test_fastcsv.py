"""Native CSV parser vs pandas oracle."""

import numpy as np
import pandas as pd
import pytest

from anime_recommendations_tpu.data import fastcsv


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory, ratings_frame):
    path = tmp_path_factory.mktemp("csv") / "ratings.csv"
    ratings_frame.to_csv(path, index=False)
    return path


def test_native_builds():
    assert fastcsv.native_available(), "g++ available in this image; build must work"


def test_parse_matches_pandas(csv_file):
    ours = fastcsv.read_numeric_csv(csv_file)
    ref = pd.read_csv(csv_file)
    assert list(ours.columns) == list(ref.columns)
    assert len(ours) == len(ref)
    for col in ref.columns:
        np.testing.assert_allclose(
            ours[col].to_numpy(np.float64), ref[col].to_numpy(np.float64)
        )
        assert ours[col].dtype == ref[col].dtype, col


def test_headerless_numeric(tmp_path):
    path = tmp_path / "raw.csv"
    path.write_text("1,2,0.5\n4,5,0.25\n")
    out = fastcsv.read_numeric_csv(path, columns=["a", "b", "c"])
    assert list(out.columns) == ["a", "b", "c"]
    np.testing.assert_allclose(out["c"], [0.5, 0.25])
    assert out["a"].dtype == np.int64


def test_floats_negatives_missing(tmp_path):
    path = tmp_path / "x.csv"
    path.write_text("a,b\n-1.5,2\n3.25,\n-0,7\n")
    out = fastcsv.read_numeric_csv(path)
    np.testing.assert_allclose(out["a"], [-1.5, 3.25, 0.0])
    assert np.isnan(out["b"].to_numpy(np.float64)[1])


def test_non_numeric_falls_back(tmp_path):
    path = tmp_path / "t.csv"
    path.write_text("a,b\n1,hello\n2,world\n")
    out = fastcsv.read_numeric_csv(path)
    assert out["b"].tolist() == ["hello", "world"]


def test_no_trailing_newline(tmp_path):
    path = tmp_path / "t.csv"
    path.write_text("a,b\n1,2\n3,4")
    out = fastcsv.read_numeric_csv(path)
    assert len(out) == 2 and out["b"].tolist() == [2, 4]
