"""Round-3 throughput experiment: resolution-tiered refine + final-converge cap.

Measures pairs/s + per-pair RMSE for refine_tier_target_points /
refine_max_iterations variants on BOTH the golden-23 batch (parity
protocol) and the 78-pair saturated batch (golden + stress + remesh, with
escalation), against the round-2 bench config. Promotion rule: per-pair
RMSE within +0.003 of base on every golden pair, and stress/remesh success
rates unchanged after escalation.
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
from kss_icp_tpu.escalate import escalate_rerun
from kss_icp_tpu.metrics import registration_measure_padded
from kss_icp_tpu.models.kss_icp import register_resampled, resample_pairs
from kss_icp_tpu.stress import golden_corpus, remesh_corpus, stress_corpus

FULL_PAD = 8192
BASE = dict(max_candidates=6, coarse_points=512, coarse_target_points=512,
            refine_candidates=2, refine_tier_iterations=12)

VARIANTS = {
    "base": dict(),
    "tiertgt1024": dict(refine_tier_target_points=1024),
    "tiertgt1536": dict(refine_tier_target_points=1536),
    "maxit64": dict(refine_max_iterations=64),
    "t1024_m64": dict(refine_tier_target_points=1024,
                      refine_max_iterations=64),
    "t1536_m64": dict(refine_tier_target_points=1536,
                      refine_max_iterations=64),
}

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
b23, b78 = len(golden), len(allp)
FAIL = 0.05

base_rmse23 = None
for name, overrides in VARIANTS.items():
    cfg = KSSICPConfig(**{**BASE, **overrides})
    arrs23 = batch_arrays(golden, cfg)
    out, rate23, c23 = timed(arrs23, cfg, b23)
    rm23 = np.asarray(measure_all(out[0], *map(jnp.asarray, arrs23[:4])))
    if base_rmse23 is None:
        base_rmse23 = rm23
    worst = float((rm23 - base_rmse23).max())
    print(f"{name:12s} b23 {rate23:7.2f} pairs/s  median={np.median(rm23):.5f} "
          f"max_d={worst:+.5f} (compile {c23:.1f}s)", flush=True)
    bad = np.nonzero(rm23 > base_rmse23 + 0.003)[0]
    if bad.size:
        print("   regressions:", [(golden[i][0], float(rm23[i]),
                                   float(base_rmse23[i])) for i in bad],
              flush=True)

    # Saturated batch with escalation (bench protocol).
    arrs78 = batch_arrays(allp, cfg)
    out78, rate78, c78 = timed(arrs78, cfg, b78)
    tr_all = jax.tree.map(np.asarray, out78[0])
    fit_all = np.asarray(out78[1])
    sp, sm_, tp, tm_, pn = arrs78
    ecfg = cfg.escalation_config()

    def resolve(sel):
        o2 = pipeline(*map(jnp.asarray, (sp[sel], sm_[sel], tp[sel], tm_[sel],
                                         pn[sel])), ecfg)
        return o2[0], np.asarray(o2[1])

    tr_all, fit_all, _, n_flag = escalate_rerun(
        resolve, fit_all, cfg.escalate_threshold, pad_multiple=b23,
        result=tr_all, chunk=b23)
    rm78 = []
    for c in range(0, b78, b23):
        sl = np.arange(c, min(c + b23, b78))
        sl_pad = np.concatenate([sl, np.zeros(b23 - sl.size, np.int64)])
        trc = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[sl_pad]), tr_all)
        rm78.append(np.asarray(measure_all(
            trc, *map(jnp.asarray, (sp[sl_pad], sm_[sl_pad], tp[sl_pad],
                                    tm_[sl_pad]))))[:sl.size])
    rm78 = np.concatenate(rm78)
    fails = [allp[i][0] for i in np.nonzero(rm78 > FAIL)[0]]
    print(f"{name:12s} b78 {rate78:7.2f} pairs/s  escalated={n_flag} "
          f"failures={len(fails)} {fails} median={np.median(rm78):.5f} "
          f"(compile {c78:.1f}s)", flush=True)
