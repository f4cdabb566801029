"""Schema parity against the reference's checked-in golden outputs.

Reads the actual golden CSVs from the read-only reference checkout when
present (skipped elsewhere) so the expected schemas come from ground truth
rather than hand-copied constants.
"""

from pathlib import Path

import pandas as pd
import pytest

from anime_recommendations_tpu.recommend.model_recs import OUTPUT_COLUMNS as MR_COLS
from anime_recommendations_tpu.recommend.similar_anime import OUTPUT_COLUMNS as SA_COLS
from anime_recommendations_tpu.recommend.similar_users import OUTPUT_COLUMNS as SU_COLS
from anime_recommendations_tpu.recommend.user_recs import OUTPUT_COLUMNS as UR_COLS

GOLDEN_DIR = Path("/root/reference/figure_file")

pytestmark = pytest.mark.skipif(
    not GOLDEN_DIR.exists(), reason="reference goldens not available"
)


def golden_columns(filename: str, **kwargs) -> list[str]:
    return list(pd.read_csv(GOLDEN_DIR / filename, **kwargs).columns)


def test_similar_anime_schema():
    # Filename contains a combining-char umlaut; resolve by glob to dodge
    # NFC/NFD normalization differences.
    path = next(GOLDEN_DIR.glob("anime_similar_to_*.csv"))
    assert SA_COLS == list(pd.read_csv(path).columns)


def test_similar_users_schema():
    assert SU_COLS == golden_columns("User_153695_similar_users.csv")


def test_user_recs_schema():
    assert UR_COLS == golden_columns("User_ID_153695_user_recs.csv")


def test_model_recs_schema():
    assert MR_COLS == golden_columns("User_ID_153695_model_recs.csv")


def test_user_prefs_schema():
    cols = golden_columns("User_ID_153695_user_prefs.csv", index_col=0)
    assert cols == ["eng_version", "Source", "Genres"]


def test_history_schema_and_lr_schedule_against_golden():
    hist = pd.read_csv(GOLDEN_DIR / "anime_nn_history.csv", index_col=0)
    assert list(hist.columns) == ["loss", "mse", "val_loss", "val_mse", "lr"]
    # Our schedule reproduces the reference's recorded lr column exactly.
    from anime_recommendations_tpu.train.schedule import lr_for_epoch
    import numpy as np

    for epoch, lr in enumerate(hist["lr"]):
        np.testing.assert_allclose(lr_for_epoch(epoch), lr, rtol=1e-6)
