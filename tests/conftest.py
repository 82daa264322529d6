"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Real TPU hardware in this environment is a single chip; multi-chip sharding
is validated on a virtual CPU mesh (SURVEY §4 test-strategy implication (d)).
Must run before jax initializes, hence env vars at import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's TPU plugin bootstrap (sitecustomize) may have forced
# jax_platforms via jax.config, which overrides the env var — override back.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gcn_song_embeddings_tpu.data import SongGraph, make_synthetic_dataset  # noqa: E402
from gcn_song_embeddings_tpu.data.device import DeviceGraph  # noqa: E402


@pytest.fixture(scope="session")
def dataset_dir(tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("data") / "dataset_synth"
    return make_synthetic_dataset(
        str(out), n_tracks=500, n_collections=120, n_clusters=8,
        tracks_per_collection=12, n_positives=1500, feature_dim=32, seed=7)


@pytest.fixture(scope="session")
def graph(dataset_dir) -> SongGraph:
    return SongGraph(dataset_dir,
                     features_file=os.path.join(dataset_dir, "features.npy"))


@pytest.fixture(scope="session")
def device_graph(graph) -> DeviceGraph:
    return DeviceGraph.from_graph(graph)


@pytest.fixture(scope="session")
def positives(graph, dataset_dir) -> np.ndarray:
    return graph.load_positives(os.path.join(dataset_dir, "positives.json"))
