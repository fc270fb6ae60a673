"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env before jax initializes (SURVEY.md §4.5 — the JAX-native way to
fake a multi-chip mesh without a pod).
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the remote TPU
# tunnel), which has ~1s per-op dispatch latency and computes f64 as f32 —
# unusable for unit tests. bench.py is the TPU path. The env var alone is NOT
# enough here: sitecustomize imports jax at interpreter start, so jax's config
# already latched the ambient value — override via jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from pathlib import Path

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
# Allow f64 oracle tests; production code passes explicit dtypes throughout.
jax.config.update("jax_enable_x64", True)

REFERENCE_DATA = Path("/root/reference/PS_AIS_Simplification/data")


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same deterministic stream
    # regardless of execution order.
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def reference_data_dir():
    if not REFERENCE_DATA.exists():
        pytest.skip("reference data not available")
    return REFERENCE_DATA
