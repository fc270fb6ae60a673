"""On-hardware Pallas kernel self-test: compiled lowering vs XLA oracles.

The CPU test suite exercises every Pallas kernel in interpreter mode
(tests/test_*_pallas.py); this script validates the REAL Mosaic lowering on
the attached TPU — the compiled kernel, its operand layouts and its tiling
— against the XLA reference paths, then prints PASS/FAIL per kernel.

Run: python scripts/tpu_selftest.py    (~1 min incl. compiles, cached after)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ksstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}")
    if dev.platform not in ("tpu", "axon"):
        print("no TPU attached — nothing to self-test (CPU suite covers "
              "interpret mode)")
        return 0

    rng = np.random.default_rng(0)
    failures = []

    def check(name, got, want, atol, exact=False):
        got, want = np.asarray(got), np.asarray(want)
        if exact:
            ok = np.array_equal(got, want)
            worst = "mismatch" if not ok else "0"
        else:
            d = np.abs(got - want).max()
            ok = bool(d <= atol)
            worst = f"{d:.3g}"
        print(f"  {'PASS' if ok else 'FAIL'}  {name:44s} (worst {worst})")
        if not ok:
            failures.append(name)

    def cloud(n):
        u = rng.uniform(-1, 1, n)
        v = rng.uniform(-1, 1, n)
        return np.stack([u, v, 0.3 * np.sin(3 * u) * np.cos(2 * v)],
                        -1).astype(np.float32)

    # --- 1. batched FPS kernel vs XLA loop (must be byte-identical) ---
    from kss_icp_tpu.ops.resample import farthest_point_sampling
    from kss_icp_tpu.ops.resample_pallas import fps_batch_pallas

    pts = np.stack([cloud(4096) for _ in range(4)])
    mask = np.ones((4, 4096), bool)
    mask[2, 3000:] = False
    idx_p, sm_p = fps_batch_pallas(jnp.asarray(pts), jnp.asarray(mask), 512)
    idx_x, sm_x = jax.vmap(
        lambda p, m: farthest_point_sampling(p, m, 512)
    )(jnp.asarray(pts), jnp.asarray(mask))
    check("fps_batch_pallas indices == XLA", idx_p, idx_x, 0, exact=True)
    check("fps_batch_pallas mask == XLA", sm_p, sm_x, 0, exact=True)

    # --- 2. fused rotation-field kernel vs XLA highest ---
    from kss_icp_tpu.core.transforms import euler_xyz_matrix
    from kss_icp_tpu.models.coarse import rotation_grid, score_rotation_field
    from kss_icp_tpu.ops.coarse_pallas import rotation_scores_pallas

    src = cloud(1024)
    tgt = cloud(2048)
    smask = np.ones((1024,), bool)
    smask[1000:] = False
    tmask = np.ones((2048,), bool)
    rots = euler_xyz_matrix(rotation_grid(8, 6.3, jnp.float32))
    got = rotation_scores_pallas(
        jnp.asarray(src), jnp.asarray(smask), jnp.asarray(tgt),
        jnp.asarray(tmask), rots)
    want = score_rotation_field(
        jnp.asarray(src), jnp.asarray(smask), jnp.asarray(tgt),
        jnp.asarray(tmask), steps=8, span=6.3, precision="highest",
        backend="xla").ravel()
    check("rotation_scores_pallas vs XLA highest", got, want, 5e-6)
    check("rotation field argmin agreement",
          np.argmin(np.asarray(got)), np.argmin(np.asarray(want)), 0,
          exact=True)

    # --- 3. exact-f32 VPU 1-NN kernel vs XLA highest ---
    from kss_icp_tpu.ops.nn import nearest_neighbor
    from kss_icp_tpu.ops.nn_pallas import nearest_neighbor_pallas, \
        nearest_neighbor_vpu

    q = cloud(2048)
    r = cloud(2048)
    rm = np.ones((2048,), bool)
    rm[2000:] = False
    d2_v, idx_v = nearest_neighbor_vpu(jnp.asarray(q), jnp.asarray(r),
                                       jnp.asarray(rm))
    d2_x, idx_x2 = nearest_neighbor(jnp.asarray(q), jnp.asarray(r),
                                    jnp.asarray(rm))
    check("nearest_neighbor_vpu indices == XLA", idx_v, idx_x2, 0, exact=True)
    check("nearest_neighbor_vpu distances", d2_v, d2_x, 1e-5)

    d2_m, idx_m = nearest_neighbor_pallas(jnp.asarray(q), jnp.asarray(r),
                                          jnp.asarray(rm))
    check("nearest_neighbor_pallas indices == XLA", idx_m, idx_x2, 0,
          exact=True)
    check("nearest_neighbor_pallas distances", d2_m, d2_x, 1e-5)

    print(f"\n{'ALL PASS' if not failures else f'{len(failures)} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
