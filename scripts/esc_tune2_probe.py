"""Escalation tuning round 2: refine-candidate budget + finisher-first
split, all at the round-5 fidelity winner (field 512/512, cap 64).

Variants (per-pair RMSE table for each):
  v1 cap64 chunk16 rc4      — reference (esc_tune_probe winner)
  v2 cap64 chunk16 rc3/rc2  — smaller escalation refine budget
  v4 split rc4              — hit-only lanes -> finisher (uncapped
                              continuation), THEN escalate only lanes with
                              post-finisher fitness > threshold (cap64,
                              chunk8); the serving-ladder restructure that
                              drops ~half the escalation work
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
    pipeline, measure_all, finish_prog = progs[0], progs[1], progs[5]

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
    fit_flag = fit0 > cfg.escalate_threshold
    flagged = np.nonzero(fit_flag | hit0)[0]
    hit_only = np.nonzero(hit0 & ~fit_flag)[0]

    def merge(tr_out, fit_out, cs, o2np, p2):
        for j, gi in enumerate(cs):
            if p2[j] < fit_out[gi]:
                fit_out[gi] = p2[j]
                jax.tree.map(lambda f, n2, _g=gi, _j=j:
                             f.__setitem__(_g, n2[_j]), tr_out, o2np)

    def esc_pass(ecfg, sel_idx, chunk, tr_out, fit_out):
        if sel_idx.size == 0:
            return
        selp = padded_selection(sel_idx, chunk)
        selp = selp[np.argsort(-fit0[selp])]
        for c0 in range(0, selp.size, chunk):
            cs = selp[c0:c0 + chunk]
            o2 = pipeline(*map(jnp.asarray,
                               (sp[cs], sm[cs], tp[cs], tm[cs], pn[cs])), ecfg)
            p2 = np.asarray(o2[1])[:, 0]
            merge(tr_out, fit_out, cs, jax.tree.map(np.asarray, o2[0]), p2)

    def fin_pass(ecfg, sel_idx, tr_out, fit_out):
        if sel_idx.size == 0:
            return
        selp = padded_selection(sel_idx, cfg.escalate_pad)
        for c0 in range(0, selp.size, cfg.escalate_pad):
            cs = selp[c0:c0 + cfg.escalate_pad]
            tr_sel = jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x)[cs]), tr_out)
            tot, fit2 = finish_prog(
                *map(jnp.asarray, (sp[cs], sm[cs], tp[cs], tm[cs], pn[cs])),
                tr_sel, ecfg)
            merge(tr_out, fit_out, cs, jax.tree.map(np.asarray, tot),
                  np.asarray(fit2))

    def rmse_rows(tr_np, sel):
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

    def variant(name, rc, split, chunk):
        ecfg = cfg.escalation_config()
        ecfg = dataclasses.replace(ecfg, refine_max_iterations=64,
                                   refine_candidates=rc)
        times = []
        tr_v = fit_v = None
        for rep in range(4):
            tr_v = jax.tree.map(lambda x: np.asarray(x).copy(), tr)
            fit_v = fit0.copy()
            t0 = time.perf_counter()
            if split:
                fin_pass(ecfg, hit_only, tr_v, fit_v)
                sel2 = np.nonzero(fit_v > cfg.escalate_threshold)[0]
                esc_pass(ecfg, sel2, chunk, tr_v, fit_v)
            else:
                esc_pass(ecfg, flagged, chunk, tr_v, fit_v)
            if rep:  # rep 0 pays compiles
                times.append(time.perf_counter() - t0)
        return min(times), tr_v, fit_v

    ref_rm = None
    for name, rc, split, chunk in [
        ("v1 rc4 chunk16", 4, False, 16),
        ("v2 rc3 chunk16", 3, False, 16),
        ("v3 rc2 chunk16", 2, False, 16),
        ("v4 split rc4 chunk8", 4, True, 8),
        ("v5 split rc3 chunk8", 3, True, 8),
    ]:
        dt, tr_v, fit_v = variant(name, rc, split, chunk)
        rm = rmse_rows(tr_v, flagged)
        if ref_rm is None:
            ref_rm = rm
            log(f"[{name}] steady {dt:.2f}s (reference)")
            for k, gi in enumerate(flagged):
                log(f"    {allp[gi][0]:14s} rmse={rm[k]:.5f}")
        else:
            d = rm - ref_rm
            tag = "; ".join(
                f"{allp[flagged[k]][0]}:{ref_rm[k]:.4f}->{rm[k]:.4f}"
                for k in np.nonzero(np.abs(d) > 5e-4)[0]) or "identical<5e-4"
            log(f"[{name}] steady {dt:.2f}s | {tag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
