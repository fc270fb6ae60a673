"""Throughput experiment: target-prefix slicing variants on the golden corpus.

Measures pairs/s (batch 23, median of 3) + per-pair RMSE for config variants
against the round-2 base config. RMSE must stay within noise of base per
pair; winners then pass the stress corpus before being promoted to bench.py.
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ksstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from kss_icp_tpu.config import KSSICPConfig
from kss_icp_tpu.core.transforms import apply_similarity
from kss_icp_tpu.io.formats import load_points
from kss_icp_tpu.metrics import registration_measure_padded
from kss_icp_tpu.models.kss_icp import register_resampled, resample_pairs

DATA_ROOT = Path("/root/reference/PS_AIS_Simplification/data")
FULL_PAD = 8192
BASE = dict(max_candidates=8, coarse_points=512, refine_candidates=2)

VARIANTS = {
    "base": dict(coarse_target_points=512, max_candidates=6,
                 refine_tier_iterations=12),
    "aivs": dict(coarse_target_points=512, max_candidates=6,
                 refine_tier_iterations=12, resampler="aivs"),
    "aivs_r32": dict(coarse_target_points=512, max_candidates=6,
                     refine_tier_iterations=12, resampler="aivs",
                     aivs_max_rounds=32, aivs_max_cuts=512),
}

print("device:", jax.devices()[0].device_kind, flush=True)


def pad(pts):
    out = np.zeros((FULL_PAD, 3), np.float32)
    n = min(len(pts), FULL_PAD)
    out[:n] = pts[:n]
    m = np.zeros((FULL_PAD,), bool)
    m[:n] = True
    return out, m


pairs = []
for subdir in ("registration", "registration_scale"):
    d = DATA_ROOT / subdir
    names = sorted({p.stem for p in d.glob("*.gird")} & {p.stem for p in d.glob("*.wlop")})
    for name in names:
        pairs.append((name, load_points(d / f"{name}.gird"), load_points(d / f"{name}.wlop")))
src = jnp.asarray(np.stack([pad(p[1])[0] for p in pairs]))
sm = jnp.asarray(np.stack([pad(p[1])[1] for p in pairs]))
tgt = jnp.asarray(np.stack([pad(p[2])[0] for p in pairs]))
tm = jnp.asarray(np.stack([pad(p[2])[1] for p in pairs]))
pn = jnp.asarray(np.array(
    [KSSICPConfig().resample_count(int(m1.sum()), int(m2.sum()))
     for m1, m2 in zip(np.asarray(sm), np.asarray(tm))], np.int32))
b = len(pairs)


@partial(jax.jit, static_argnames=("cfg",))
def pipeline(sp, sm_, tp, tm_, pnum, cfg):
    (rs, rsm), (rt, rtm) = resample_pairs(sp, sm_, tp, tm_, pnum, cfg)

    def one(a, bb, c, dd):
        r = register_resampled(a, bb, c, dd, cfg)
        return r.transform, r.fitness

    return jax.vmap(one)(rs, rsm, rt, rtm)


@jax.jit
def measure_all(tr, sp, sm_, tp, tm_):
    def one(tri, spi, smi, tpi, tmi):
        return registration_measure_padded(
            apply_similarity(tri, spi), smi, tpi, tmi)["rmse"]
    return jax.vmap(one)(tr, sp, sm_, tp, tm_)


base_rmse = None
for name, overrides in VARIANTS.items():
    cfg = KSSICPConfig(**{**BASE, **overrides})
    t0 = time.perf_counter()
    out = pipeline(src, sm, tgt, tm, pn, cfg)
    np.asarray(out[1])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = pipeline(src, sm, tgt, tm, pn, cfg)
        np.asarray(out[1])
        ts.append(time.perf_counter() - t0)
    rm = np.asarray(measure_all(out[0], src, sm, tgt, tm))
    if base_rmse is None:
        base_rmse = rm
    worst = float((rm - base_rmse).max())
    print(f"{name:18s} {b/min(ts):7.2f} pairs/s  median_rmse={np.median(rm):.5f} "
          f"max_delta_vs_base={worst:+.5f}  (compile {compile_s:.1f}s)",
          flush=True)
    bad = np.nonzero(rm > base_rmse + 0.003)[0]
    if bad.size:
        print("   regressions:", [(pairs[i][0], float(rm[i]), float(base_rmse[i]))
                                  for i in bad], flush=True)
