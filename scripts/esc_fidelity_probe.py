"""Escalation-pass fidelity ladder (round 5, VERDICT r4 item 1).

The r4 escalation pass re-scans the full 16^3 grid at full 2048x2048
fidelity (~1.9 s steady) — the honest e2e serving bottleneck. This probe
measures, on the real 78-pair serving corpus:

  per variant: steady escalation-pass seconds (3 reps over the SAME flagged
  selection) + post-ladder per-pair RMSE of every flagged pair, diffed
  against the full-fidelity reference variant.

Variants: field prefixes (escalate_coarse_points / _target), screen target
prefix, two-tier refine, and the hit-only->finisher split (lanes flagged
ONLY by hit-cap go to the cheap uncapped finisher instead of the 16^3
re-solve; re-flag by fitness afterwards).

Usage:  python scripts/esc_fidelity_probe.py            # TPU (ambient)
        python scripts/esc_fidelity_probe.py --cpu      # force CPU
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/ksstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import bench
    from kss_icp_tpu.escalate import padded_selection
    from kss_icp_tpu.stress import golden_corpus, remesh_corpus, stress_corpus

    cfg = bench.bench_config()
    progs = bench.make_programs()
    pipeline, measure_all, finish_prog = progs[0], progs[1], progs[5]

    pairs = golden_corpus()
    b = len(pairs)
    allp = (pairs + stress_corpus()
            + [(nm, s, t) for nm, s, t, _ in remesh_corpus()])
    nsat = len(allp)
    log(f"corpus: {nsat} pairs")

    def pad(pts):
        out = np.zeros((bench.FULL_PAD, 3), np.float32)
        n = min(len(pts), bench.FULL_PAD)
        out[:n] = pts[:n]
        m = np.zeros((bench.FULL_PAD,), bool)
        m[:n] = True
        return out, m

    sp = np.stack([pad(p[1])[0] for p in allp])
    sm = np.stack([pad(p[1])[1] for p in allp])
    tp = np.stack([pad(p[2])[0] for p in allp])
    tm = np.stack([pad(p[2])[1] for p in allp])
    pn = np.array([cfg.resample_count(int(m1.sum()), int(m2.sum()))
                   for m1, m2 in zip(sm, tm)], np.int32)
    args = tuple(map(jnp.asarray, (sp, sm, tp, tm, pn)))

    # Base pass (once): flags + incumbent fitness/transform.
    t0 = time.perf_counter()
    tr, packed = pipeline(*args, cfg)
    packed_np = np.asarray(packed)
    log(f"base pass: {time.perf_counter() - t0:.1f}s (incl. compile)")
    fit0 = packed_np[:, 0]
    hit0 = packed_np[:, 1] > 0.5
    flags = (fit0 > cfg.escalate_threshold) | hit0
    flagged = np.nonzero(flags)[0]
    fit_only = np.nonzero(fit0 > cfg.escalate_threshold)[0]
    hit_only = np.nonzero(hit0 & ~(fit0 > cfg.escalate_threshold))[0]
    log(f"flagged: {flagged.size} (fitness {fit_only.size}, "
        f"hit-only {hit_only.size}) -> {[allp[i][0] for i in flagged]}")

    ep = cfg.escalate_pad

    def run_ladder(ecfg, sel_idx):
        """One escalation pass over sel_idx (hard-first, ep chunks).
        Returns (wall_s, merged transforms tree for flagged rows)."""
        selp = padded_selection(sel_idx, ep)
        selp = selp[np.argsort(-fit0[selp])]
        tr_out = jax.tree.map(lambda x: np.asarray(x).copy(), tr)
        fit_out = fit0.copy()
        t0 = time.perf_counter()
        for c0 in range(0, selp.size, ep):
            cs = selp[c0:c0 + ep]
            o2 = pipeline(*map(jnp.asarray,
                               (sp[cs], sm[cs], tp[cs], tm[cs], pn[cs])), ecfg)
            p2 = np.asarray(o2[1])
            o2np = jax.tree.map(np.asarray, o2[0])
            for j, gi in enumerate(cs):
                if p2[j, 0] < fit_out[gi]:
                    fit_out[gi] = p2[j, 0]
                    jax.tree.map(lambda f, n2, _g=gi, _j=j:
                                 f.__setitem__(_g, n2[_j]), tr_out, o2np)
        dt = time.perf_counter() - t0
        return dt, tr_out, fit_out

    def rmse_rows(tr_np, rows):
        sel = padded_selection(rows, 1)
        tr_sel = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[sel]), tr_np)
        # chunk through the b-sized measure program
        out = np.zeros(sel.size)
        total = ((sel.size + b - 1) // b) * b
        idx = np.concatenate([sel, np.repeat(sel[:1], total - sel.size)])
        for c in range(total // b):
            sl = idx[c * b:(c + 1) * b]
            tr_c = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[sl]), tr_np)
            r = np.asarray(measure_all(
                tr_c, *map(jnp.asarray, (sp[sl], sm[sl], tp[sl], tm[sl]))))
            take = min(b, sel.size - c * b)
            out[c * b:c * b + take] = r[:take]
        return out

    variants = [
        ("r4-full (reference)", {}),
        ("field 1024/1024", dict(escalate_coarse_points=1024,
                                 escalate_coarse_target_points=1024)),
        ("field 512/512", dict(escalate_coarse_points=512,
                               escalate_coarse_target_points=512)),
        ("field 512/512 + screen 1024",
         dict(escalate_coarse_points=512, escalate_coarse_target_points=512,
              escalate_screen_target_points=1024)),
        ("field 512/512 + tier 12",
         dict(escalate_coarse_points=512, escalate_coarse_target_points=512,
              escalate_refine_tier_iterations=12)),
    ]

    ref_rmse = None
    results = []
    for name, kw in variants:
        ecfg = dataclasses.replace(cfg, **kw).escalation_config()
        # compile + first pass
        dt_c, tr_v, fit_v = run_ladder(ecfg, flagged)
        times = []
        for _ in range(3):
            dt, tr_v, fit_v = run_ladder(ecfg, flagged)
            times.append(dt)
        rm = rmse_rows(tr_v, flagged)
        if ref_rmse is None:
            ref_rmse = rm
        d = rm - ref_rmse
        worst = int(np.argmax(np.abs(d)))
        log(f"[{name}] steady {min(times):.2f}s (first {dt_c:.1f}s) | "
            f"flagged-RMSE max|d|={np.abs(d).max():.6f} "
            f"({allp[flagged[worst]][0]}: {ref_rmse[worst]:.5f} -> "
            f"{rm[worst]:.5f}) | post-fit>thr: "
            f"{int(np.sum(fit_v[flagged] > cfg.escalate_threshold))}")
        results.append((name, min(times), rm.copy()))

    # --- hit-only -> finisher split (uses the best fidelity variant) -----
    ecfg = dataclasses.replace(
        cfg, escalate_coarse_points=512,
        escalate_coarse_target_points=512).escalation_config()
    t0 = time.perf_counter()
    tr_fin = jax.tree.map(lambda x: np.asarray(x).copy(), tr)
    fit_fin = fit0.copy()
    if hit_only.size:
        selp = padded_selection(hit_only, ep)
        for c0 in range(0, selp.size, ep):
            cs = selp[c0:c0 + ep]
            tr_sel = jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x)[cs]), tr_fin)
            tot, fit2 = finish_prog(
                *map(jnp.asarray, (sp[cs], sm[cs], tp[cs], tm[cs], pn[cs])),
                tr_sel, ecfg)
            f2 = np.asarray(fit2)
            totnp = jax.tree.map(np.asarray, tot)
            for j, gi in enumerate(cs):
                if f2[j] < fit_fin[gi]:
                    fit_fin[gi] = f2[j]
                    jax.tree.map(lambda f, n2, _g=gi, _j=j:
                                 f.__setitem__(_g, n2[_j]), tr_fin, totnp)
    refl = np.nonzero(fit_fin > cfg.escalate_threshold)[0]
    dt1 = time.perf_counter() - t0
    log(f"[split] finisher on {hit_only.size} hit-only lanes: {dt1:.2f}s "
        f"(first run, incl. compile); re-flagged by fitness: {refl.size}")
    # escalate only the re-flagged + fitness-flagged lanes
    sel2 = np.nonzero(fit_fin > cfg.escalate_threshold)[0]
    times = []
    for _ in range(3):
        dt, tr_v, fit_v = run_ladder(ecfg, sel2) if sel2.size else (0.0, tr_fin, fit_fin)
        times.append(dt)
    # steady finisher time
    tf = []
    if hit_only.size:
        selp = padded_selection(hit_only, ep)
        for _ in range(3):
            t0 = time.perf_counter()
            for c0 in range(0, selp.size, ep):
                cs = selp[c0:c0 + ep]
                tr_sel = jax.tree.map(
                    lambda x: jnp.asarray(np.asarray(x)[cs]), tr_fin)
                out = finish_prog(
                    *map(jnp.asarray, (sp[cs], sm[cs], tp[cs], tm[cs], pn[cs])),
                    tr_sel, ecfg)
                np.asarray(out[1])
            tf.append(time.perf_counter() - t0)
    rm = rmse_rows(tr_v, flagged)
    d = rm - ref_rmse
    log(f"[split] steady: finisher {min(tf) if tf else 0:.2f}s + escalation "
        f"{min(times):.2f}s on {sel2.size} lanes | flagged-RMSE "
        f"max|d|={np.abs(d).max():.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
