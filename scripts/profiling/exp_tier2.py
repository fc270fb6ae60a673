"""Round-3 follow-up: final-converge cap ladder + tiled saturation batches.

exp_tier.py established refine_max_iterations=64 recovers the saturated
batch (20 -> 136 pairs/s) with bit-identical golden accuracy. This sweep:
  - cap ladder 32/48/64 with PER-PAIR RMSE deltas on the 78-pair batch
    (a too-low cap can silently degrade accuracy without triggering
    escalation -- the flag only fires on fitness);
  - tiled saturation: the 78 real pairs tiled x2 and x3 (batch 156/234)
    at the winning cap -- the serving-ceiling measurement with real pairs.
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
from kss_icp_tpu.metrics import registration_measure_padded
from kss_icp_tpu.models.kss_icp import register_resampled, resample_pairs
from kss_icp_tpu.stress import golden_corpus, remesh_corpus, stress_corpus

FULL_PAD = 8192
BASE = dict(max_candidates=6, coarse_points=512, coarse_target_points=512,
            refine_candidates=2, refine_tier_iterations=12)
CAPS = [0, 64, 48, 32]

print("device:", jax.devices()[0].device_kind, flush=True)


def pad(pts):
    out = np.zeros((FULL_PAD, 3), np.float32)
    n = min(len(pts), FULL_PAD)
    out[:n] = pts[:n]
    m = np.zeros((FULL_PAD,), bool)
    m[:n] = True
    return out, m


def batch_arrays(corpus, cfg):
    sp = np.stack([pad(p[1])[0] for p in corpus])
    sm = np.stack([pad(p[1])[1] for p in corpus])
    tp = np.stack([pad(p[2])[0] for p in corpus])
    tm = np.stack([pad(p[2])[1] for p in corpus])
    pn = np.array([cfg.resample_count(int(m1.sum()), int(m2.sum()))
                   for m1, m2 in zip(sm, tm)], np.int32)
    return sp, sm, tp, tm, pn


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


def timed(arrs, cfg, n):
    a = tuple(map(jnp.asarray, arrs))
    t0 = time.perf_counter()
    out = pipeline(*a, cfg)
    np.asarray(out[1])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = pipeline(*a, cfg)
        np.asarray(out[1])
        ts.append(time.perf_counter() - t0)
    return out, n / min(ts), compile_s


golden = golden_corpus()
stress = stress_corpus()
remesh = [(nm, s, t) for nm, s, t, _ in remesh_corpus()]
allp = golden + stress + remesh
names = [p[0] for p in allp]
b78 = len(allp)

base_rmse = None
best_cap = 64
for cap in CAPS:
    cfg = KSSICPConfig(**BASE, refine_max_iterations=cap)
    arrs = batch_arrays(allp, cfg)
    out, rate, cs = timed(arrs, cfg, b78)
    # Pre-escalation RMSE: expose what the cap does to accuracy directly
    # (escalation would mask silent degradation below the fitness flag).
    rm = np.asarray(measure_all(out[0], *map(jnp.asarray, arrs[:4])))
    fit = np.asarray(out[1])
    if base_rmse is None:
        base_rmse = rm
    d = rm - base_rmse
    esc = int((fit > cfg.escalate_threshold).sum())
    print(f"cap={cap:4d} b78 {rate:7.2f} pairs/s  median={np.median(rm):.5f} "
          f"max_d={d.max():+.5f} flagged={esc} (compile {cs:.1f}s)",
          flush=True)
    bad = np.nonzero(d > 0.003)[0]
    if bad.size:
        print("   degraded:", [(names[i], round(float(rm[i]), 5),
                                round(float(base_rmse[i]), 5),
                                bool(fit[i] > cfg.escalate_threshold))
                               for i in bad], flush=True)

cfg = KSSICPConfig(**BASE, refine_max_iterations=best_cap)
for tile in (2, 3):
    tiled = allp * tile
    arrs = batch_arrays(tiled, cfg)
    out, rate, cs = timed(arrs, cfg, len(tiled))
    print(f"tiled x{tile} (batch {len(tiled)}): {rate:7.2f} pairs/s "
          f"(compile {cs:.1f}s)", flush=True)
