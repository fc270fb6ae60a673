"""Escalation tuning round 3: candidate/screen budget at the shipped r5 config (round 5, follow-up to
esc_fidelity_probe): refine caps, chunk width, and the per-pair
fitness-floor table that motivates a density-aware escalation threshold.

All variants run the field at 512/512 prefix fidelity (the parity-clean
winner of the fidelity ladder). Prints a full per-pair RMSE table for
every variant (not just the worst delta).

Usage: python scripts/esc_tune_probe.py
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

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

    cfg = dataclasses.replace(
        bench.bench_config(),
        escalate_coarse_points=512, escalate_coarse_target_points=512)
    progs = bench.make_programs()
    pipeline, measure_all = progs[0], progs[1]

    pairs = golden_corpus()
    b = len(pairs)
    allp = (pairs + stress_corpus()
            + [(nm, s, t) for nm, s, t, _ in remesh_corpus()])

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

    tr, packed = pipeline(*args, cfg)
    packed_np = np.asarray(packed)
    fit0 = packed_np[:, 0]
    hit0 = packed_np[:, 1] > 0.5
    flags = (fit0 > cfg.escalate_threshold) | hit0
    flagged = np.nonzero(flags)[0]
    log(f"flagged {flagged.size}: " + ", ".join(
        f"{allp[i][0]}(fit={fit0[i]:.2e},hit={int(hit0[i])},pn={pn[i]})"
        for i in flagged))

    def run_ladder(ecfg, sel_idx, chunk):
        selp = padded_selection(sel_idx, chunk)
        selp = selp[np.argsort(-fit0[selp])]
        tr_out = jax.tree.map(lambda x: np.asarray(x).copy(), tr)
        fit_out = fit0.copy()
        t0 = time.perf_counter()
        for c0 in range(0, selp.size, chunk):
            cs = selp[c0:c0 + chunk]
            o2 = pipeline(*map(jnp.asarray,
                               (sp[cs], sm[cs], tp[cs], tm[cs], pn[cs])), ecfg)
            p2 = np.asarray(o2[1])
            o2np = jax.tree.map(np.asarray, o2[0])
            for j, gi in enumerate(cs):
                if p2[j, 0] < fit_out[gi]:
                    fit_out[gi] = p2[j, 0]
                    jax.tree.map(lambda f, n2, _g=gi, _j=j:
                                 f.__setitem__(_g, n2[_j]), tr_out, o2np)
        return time.perf_counter() - t0, tr_out, fit_out

    def rmse_rows(tr_np, rows):
        sel = rows
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
        ("shipped r5 (cand16 screen20)", dict(), 16),
        ("cand12", dict(max_candidates=12), 16),
        ("screen12", dict(screen_iterations=12), 16),
        ("cand12+screen12", dict(max_candidates=12, screen_iterations=12), 16),
    ]

    ref = None
    for name, kw, chunk in variants:
        ecfg = dataclasses.replace(cfg.escalation_config(), **kw)
        dt0, tr_v, fit_v = run_ladder(ecfg, flagged, chunk)
        times = []
        for _ in range(3):
            dt, tr_v, fit_v = run_ladder(ecfg, flagged, chunk)
            times.append(dt)
        rm = rmse_rows(tr_v, flagged)
        if ref is None:
            ref = rm
            log(f"[{name}] steady {min(times):.2f}s (reference)")
            for k, gi in enumerate(flagged):
                log(f"    {allp[gi][0]:14s} rmse={rm[k]:.5f} "
                    f"fit={fit_v[gi]:.2e}")
        else:
            d = rm - ref
            tag = "; ".join(
                f"{allp[flagged[k]][0]}:{ref[k]:.4f}->{rm[k]:.4f}"
                for k in np.nonzero(np.abs(d) > 5e-4)[0]) or "identical<5e-4"
            log(f"[{name}] steady {min(times):.2f}s | {tag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
