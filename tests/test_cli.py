"""CLI smoke tests (in-process main() calls)."""

import pandas as pd
import pytest

from anime_recommendations_tpu.cli import main


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_runs")
    overrides = [
        "--set", "data.synthetic_users=200",
        "--set", "data.synthetic_anime=100",
        "--set", "data.synthetic_interactions=15000",
        "--set", "data.num_reviews=40",
        "--set", "model.embedding_size=8",
        "--set", "model.epochs=1",
        "--set", "model.batch_size=1024",
        "--set", "model.test_size=500",
        "--run-dir", str(d),
    ]
    assert main(["ingest", *overrides]) == 0
    assert main(["preprocess", *overrides]) == 0
    assert main(["train", *overrides]) == 0
    return d, overrides


def test_cli_queries(run_dir, capsys):
    d, overrides = run_dir
    assert main(["similar-anime", "Anime 00009", "-k", "3", *overrides]) == 0
    out = capsys.readouterr().out
    assert "Similarity" in out

    # Find a valid trained user from the store.
    from anime_recommendations_tpu.pipeline.artifacts import ArtifactStore
    from anime_recommendations_tpu.data.vocab import Vocab

    store = ArtifactStore(d / "anime_recommendations" / "artifacts")
    vocab = Vocab.load(store.get("anime_nn_model.npz:latest").file("vocab.json"))
    uid = str(int(vocab.user_ids[0]))

    assert main(["similar-users", uid, "-k", "3", *overrides]) == 0
    assert "similar_users" in capsys.readouterr().out
    assert main(["model-recs", uid, "-k", "3", *overrides]) == 0
    assert "Prediction" in capsys.readouterr().out
    assert main(["user-prefs", uid, *overrides]) == 0
    assert "Genres" in capsys.readouterr().out


def test_cli_pipeline_steps_arg(tmp_path):
    rc = main([
        "pipeline", "--steps", "ingest", "preprocess",
        "--set", "data.synthetic_users=100",
        "--set", "data.synthetic_anime=60",
        "--set", "data.synthetic_interactions=6000",
        "--set", "data.num_reviews=20",
        "--run-dir", str(tmp_path),
    ])
    assert rc == 0
    assert (tmp_path / "anime_recommendations" / "artifacts").exists()


def test_cli_bad_override():
    with pytest.raises(KeyError):
        main(["ingest", "--set", "model.not_a_key=1"])
