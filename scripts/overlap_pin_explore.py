"""Explore candidate pairs for the overlap-calibration CI pin
(tests/test_overlap_calibration.py).

For each candidate pair: incumbent = production-like solve (base bench
config + prefix-fidelity 16^3 escalation, overlap tier OFF), overlap
solve = first rung (overlap_config at the base grid), then the two ladder
ratios:

  adopt_ratio = tfit(overlap) / tfit(incumbent)   (margin 0.7)
  gate_ratio  = tfit(incumbent) / fit(incumbent)  (gate 1.05)

Candidates: hard-partial + partial challenge pairs (win side), remesh
density-floor + category pairs (block side).

Usage: python scripts/overlap_pin_explore.py   (CPU; ~15 min)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import dataclasses

    from kss_icp_tpu.challenge import category_corpus, partial_corpus
    from kss_icp_tpu.config import KSSICPConfig
    from kss_icp_tpu.models.kss_icp import (
        register_overlap_resampled,
        register_resampled,
        resample_pairs,
        trimmed_fitness,
    )
    from kss_icp_tpu.stress import remesh_corpus

    cfg = KSSICPConfig(
        max_candidates=6, coarse_points=512, coarse_target_points=512,
        refine_candidates=2, refine_tier_iterations=12,
        refine_max_iterations=48,
        escalate_coarse_points=512, escalate_coarse_target_points=512)

    hard = {p[0]: p for p in partial_corpus(keep=0.8)}
    part = {p[0]: p for p in partial_corpus()}
    cat = {p[0]: p for p in category_corpus(instances=2)}
    try:
        rem = {nm: (nm, s, t, None) for nm, s, t, _ in remesh_corpus()}
    except Exception as e:
        log(f"remesh unavailable: {e}")
        rem = {}

    cands = []
    for nm in ("part/se0", "part/rev0", "part/box0", "part/box1"):
        cands.append(("hard-win", hard[nm]))
    for nm in ("part/se0", "part/box0"):
        cands.append(("part-win", part[nm]))
    for nm in ("se/0", "box/0", "rev/1", "tube/0"):
        cands.append(("cat-block", cat[nm]))
    for nm in list(rem)[:6]:
        cands.append(("rem-block", rem[nm]))

    q = cfg.overlap_trim_fraction
    for label, (name, src, tgt, *_r) in cands:
        t0 = time.perf_counter()
        pad = 8192
        sp = np.zeros((1, pad, 3), np.float32)
        sp[0, : len(src)] = src[:pad]
        sm = np.zeros((1, pad), bool)
        sm[0, : min(len(src), pad)] = True
        tp = np.zeros((1, pad, 3), np.float32)
        tp[0, : len(tgt)] = tgt[:pad]
        tm = np.zeros((1, pad), bool)
        tm[0, : min(len(tgt), pad)] = True
        pn = jnp.asarray([cfg.resample_count(len(src), len(tgt))], jnp.int32)
        (rs, rsm), (rt, rtm) = resample_pairs(
            jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp),
            jnp.asarray(tm), pn, cfg)
        a = (rs[0], rsm[0], rt[0], rtm[0])
        inc = register_resampled(*a, cfg)
        fit = float(inc.fitness)
        esc = False
        if fit > cfg.escalate_threshold or bool(inc.refine_hit_cap):
            inc2 = register_resampled(*a, cfg.escalation_config())
            if float(inc2.fitness) < fit:
                inc, fit, esc = inc2, float(inc2.fitness), True
        tf_old = float(trimmed_fitness(inc.transform, *a, q))
        ovl = register_overlap_resampled(*a, cfg.overlap_config())
        tf_new = float(ovl.fitness)
        log(f"{label:9s} {name:12s} fit={fit:.6f} esc={int(esc)} "
            f"gate={tf_old / max(fit, 1e-12):6.3f} "
            f"adopt={tf_new / max(tf_old, 1e-12):6.3f} "
            f"({time.perf_counter() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
