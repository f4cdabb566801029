"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4 plan (c)).

Must run before jax initializes its backends, hence the env mutation at
module import time. All distributed tests exercise real mesh/pjit/shard_map
code paths on fake devices; the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip.
"""

import os

# Opt into a real-TPU run with ANIMEREC_TEST_TPU=1; default is the 8-device
# virtual CPU mesh regardless of what the parent shell exports.
if os.environ.get("ANIMEREC_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

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
