"""Round-3 two-stage-converge sweep (refine_max_iterations stage-1 cap +
refine_polish_iterations warm-started continuation).

The vmapped final-converge while_loop runs every lane to the slowest lane;
polish re-launches only hit-cap lanes. Timed exactly like bench.py's
run_to_completion (pipeline + polish dispatches + host merges), per-pair
RMSE checked against the single-stage cap-48 config on the golden 23 and
the 78-pair saturated batch.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ksstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import make_programs
from kss_icp_tpu.config import KSSICPConfig
from kss_icp_tpu.escalate import polish_rerun
from kss_icp_tpu.stress import golden_corpus, remesh_corpus, stress_corpus

FULL_PAD = 8192
BASE = dict(max_candidates=6, coarse_points=512, coarse_target_points=512,
            refine_candidates=2, refine_tier_iterations=12)

# With the exact-f32 convergence MSE, well-behaved lanes converge in <= ~14
# iterations (CPU-measured); only genuinely non-converging lanes hit a cap
# (2 of 78 on TPU at cap 48). Stage-1 cap 16 bounds the lockstep tail the
# 2 bad lanes impose; polish at 48 finishes them off-loop.
VARIANTS = [
    ("cap48", dict(refine_max_iterations=48)),
    # Stage-1 cap 16 cut 11 mid-oscillation lanes and lost (measured);
    # at 32 only the true non-convergers should hit the cap, with polish
    # preserving their accuracy while the lockstep tail drops 48 -> 32.
    ("s32_p48", dict(refine_max_iterations=32, refine_polish_iterations=48)),
]

print("device:", jax.devices()[0].device_kind, flush=True)
pipeline, measure_all, polish = make_programs()


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
    return tuple(map(jnp.asarray, (sp, sm, tp, tm, pn)))


def run_to_completion(a, c):
    tr, packed = pipeline(*a, c)
    packed_np = np.asarray(packed)
    fit_np, hit_np = packed_np[:, 0], packed_np[:, 1] > 0.5
    n_hit = int(hit_np.sum())
    if c.refine_polish_iterations and c.refine_max_iterations and hit_np.any():
        def resolve(sel):
            tot, fit2 = polish(jnp.asarray(sel), *a, tr, c)
            return tot, np.asarray(fit2)

        tr_np, fit_np, _, _ = polish_rerun(
            resolve, hit_np, fit_np, c.escalate_pad, result=tr)
        return jax.tree.map(jnp.asarray, tr_np), fit_np, n_hit
    return tr, fit_np, n_hit


def timed(a, cfg, n):
    t0 = time.perf_counter()
    out = run_to_completion(a, cfg)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_to_completion(a, cfg)
        ts.append(time.perf_counter() - t0)
    return out, n / min(ts), compile_s


golden = golden_corpus()
stress = stress_corpus()
remesh = [(nm, s, t) for nm, s, t, _ in remesh_corpus()]
allp = golden + stress + remesh

bases = {}
for label, over in VARIANTS:
    cfg = KSSICPConfig(**BASE, **over)
    for tag, corpus in (("b23", golden), ("b78", allp)):
        a = batch_arrays(corpus, cfg)
        (tr, fit, n_hit), rate, cs = timed(a, cfg, len(corpus))
        rm = np.asarray(measure_all(tr, *a[:4]))
        key = tag
        if key not in bases:
            bases[key] = rm
        d = rm - bases[key]
        print(f"{label:8s} {tag} {rate:7.2f} pairs/s  median={np.median(rm):.5f} "
              f"max_d={d.max():+.5f} hit_cap={n_hit} (compile {cs:.1f}s)",
              flush=True)
        bad = np.nonzero(d > 0.003)[0]
        if bad.size:
            print("   degraded:", [(corpus[i][0], round(float(rm[i]), 5),
                                    round(float(bases[key][i]), 5))
                                   for i in bad], flush=True)
