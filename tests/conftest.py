"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4 plan (c)).

The environment injects a TPU PJRT plugin via sitecustomize at interpreter
startup, so env-var forcing is too late; instead the jax config is flipped
to an 8-device CPU topology here, before any backend initializes. All
distributed tests then exercise real mesh/pjit/shard_map code paths on
fake devices; the driver separately dry-runs the multi-chip path via
__graft_entry__.dryrun_multichip. Opt into the real TPU with
ANIMEREC_TEST_TPU=1.
"""

import os

if os.environ.get("ANIMEREC_TEST_TPU", "0") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pytest  # noqa: E402

from anime_recommendations_tpu.data import synthetic  # noqa: E402


@pytest.fixture(scope="session")
def ratings_frame() -> pd.DataFrame:
    return synthetic.synth_ratings(
        n_users=300, n_anime=120, n_interactions=30_000, seed=7
    )


@pytest.fixture(scope="session")
def anime_catalog_frame() -> pd.DataFrame:
    return synthetic.synth_anime_catalog(n_anime=120, seed=7)


@pytest.fixture(scope="session")
def synopses_frame(anime_catalog_frame) -> pd.DataFrame:
    return synthetic.synth_synopses(anime_catalog_frame, seed=7)


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
