"""Accuracy parity vs the measured reference baseline (BASELINE_ORACLE.json).

The oracle numbers are recorded by scripts/measure_baseline.py (faithful
numpy/scipy replica of the reference pipeline). This test re-registers a
golden pair with the production pipeline at the bench config and asserts
its RMSE does not drift above the oracle's for that pair beyond the
measured multi-start noise band — the per-pair parity contract VERDICT
round 1 asked for, enforced in CI.
"""

import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
ORACLE = REPO / "BASELINE_ORACLE.json"
DATA = Path("/root/reference/PS_AIS_Simplification/data/registration")

pytestmark = pytest.mark.skipif(
    not (ORACLE.exists() and DATA.exists()),
    reason="oracle baseline or reference data not present",
)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["Cat", "woodMan"])
def test_pipeline_rmse_within_oracle_band(name):
    import jax.numpy as jnp

    from kss_icp_tpu.config import KSSICPConfig
    from kss_icp_tpu.core.transforms import apply_similarity
    from kss_icp_tpu.io.formats import load_points
    from kss_icp_tpu.metrics import registration_measure
    from kss_icp_tpu.models.kss_icp import register_pair

    oracle = json.loads(ORACLE.read_text())["pairs"][name]
    src = load_points(DATA / f"{name}.gird").astype(np.float32)
    tgt = load_points(DATA / f"{name}.wlop").astype(np.float32)

    cfg = KSSICPConfig(max_candidates=6, coarse_points=512,
                       coarse_target_points=512, refine_candidates=2,
                       refine_tier_iterations=12)
    res = register_pair(src, tgt, cfg)
    aligned = np.asarray(apply_similarity(res.transform, jnp.asarray(src)))
    m = registration_measure(aligned, tgt)
    # Multi-start basin noise measured at ±0.005 across runs (BASELINE.md);
    # anything beyond oracle + 0.006 is a real accuracy regression.
    assert m["rmse"] <= oracle["rmse"] + 0.006, (m["rmse"], oracle["rmse"])
