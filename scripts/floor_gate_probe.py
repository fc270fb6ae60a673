"""Floor-relative escalation gate — population study (round 5).

The absolute escalation threshold's calibration gap keeps shrinking as
the corpus grows (r4: [1.5e-3, 2.07e-3]; r5 after rev/6: [1.50e-3,
1.60e-3] — +-3%). The structural fix: normalize each pair's fitness by
its own sampling-density floor. Estimator: the mean squared 2nd-NN
distance of the resampled TARGET to itself (the 1st NN is the point
itself) — a correct solve's fitness sits at a shape-independent multiple
of it, a wrong-basin impostor's far above.

This probe computes, for every serving + challenge pair, the BASE
solve's fitness, the floor estimate, and whether the base solve is
pose/RMSE-correct, then prints the correct/wrong populations under both
gates:  absolute fitness  vs  fitness / floor_estimate.

Usage: python scripts/floor_gate_probe.py    (TPU)
"""

from __future__ import annotations

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
    from functools import partial

    import bench
    from kss_icp_tpu.challenge import challenge_corpus, transform_rmse
    from kss_icp_tpu.core.transforms import apply_similarity
    from kss_icp_tpu.models.kss_icp import resample_pairs
    from kss_icp_tpu.ops.nn import knn
    from kss_icp_tpu.stress import golden_corpus, remesh_corpus, stress_corpus

    cfg = bench.bench_config()
    progs = bench.make_programs()
    pipeline, measure_all = progs[0], progs[1]

    @partial(jax.jit, static_argnames=("cfg",))
    def floor_est(sp, sm_, tp, tm_, pn, cfg):
        # mean squared 2nd-NN self-distance of the resampled target
        (rs, rsm), (rt, rtm) = resample_pairs(sp, sm_, tp, tm_, pn, cfg)

        def one(t, m):
            d2, _ = knn(t, t, m, k=2)
            w = m.astype(jnp.float32)
            return jnp.sum(d2[:, 1] * w) / jnp.maximum(jnp.sum(w), 1.0)

        return jax.vmap(one)(rt, rtm)

    def pad(pts):
        out = np.zeros((bench.FULL_PAD, 3), np.float32)
        n = min(len(pts), bench.FULL_PAD)
        out[:n] = pts[:n]
        m = np.zeros((bench.FULL_PAD,), bool)
        m[:n] = True
        return out, m

    rows = []

    def add_corpus(label, pairs, gts=None):
        n = len(pairs)
        sp = np.stack([pad(p[1])[0] for p in pairs])
        sm = np.stack([pad(p[1])[1] for p in pairs])
        tp = np.stack([pad(p[2])[0] for p in pairs])
        tm = np.stack([pad(p[2])[1] for p in pairs])
        pn = np.array([cfg.resample_count(int(a.sum()), int(b.sum()))
                       for a, b in zip(sm, tm)], np.int32)
        b = 23
        total = ((n + b - 1) // b) * b
        idx = np.concatenate([np.arange(n), np.zeros(total - n, np.int64)])
        for c in range(total // b):
            sl = idx[c * b:(c + 1) * b]
            args = tuple(map(jnp.asarray,
                             (sp[sl], sm[sl], tp[sl], tm[sl], pn[sl])))
            tr, packed = pipeline(*args, cfg)
            p2 = np.asarray(packed)
            fl = np.asarray(floor_est(*args, cfg))
            rm = np.asarray(measure_all(tr, *args[:4]))
            for j, gi in enumerate(sl):
                if c * b + j >= n:
                    break
                if gts is not None:
                    rec = np.asarray(apply_similarity(
                        jax.tree.map(lambda x, _j=j: jnp.asarray(x[_j]), tr),
                        jnp.asarray(pairs[gi][1], jnp.float32)))
                    err = transform_rmse(rec, pairs[gi][1], gts[gi])
                    ok = err <= (0.25 if "hard" not in label else 0.35)
                else:
                    ok = rm[j] < 0.05
                rows.append({"name": f"{label}/{pairs[gi][0]}",
                             "fit": float(p2[j, 0]),
                             "floor": float(fl[j]),
                             "ratio": float(p2[j, 0] / max(fl[j], 1e-12)),
                             "ok": bool(ok), "pn": int(pn[gi])})

    add_corpus("golden", golden_corpus())
    add_corpus("stress", stress_corpus())
    add_corpus("remesh", [(nm, s, t) for nm, s, t, _ in remesh_corpus()])
    for scen, ps, _thr in challenge_corpus(include_hard=True):
        add_corpus(scen, [(nm, s, t) for nm, s, t, _gt in ps],
                   gts=[g for _nm, _s, _t, g in ps])

    ok_rows = [r for r in rows if r["ok"]]
    bad_rows = [r for r in rows if not r["ok"]]

    def pop(rs, key):
        v = sorted(r[key] for r in rs)
        return v

    for key in ("fit", "ratio"):
        okv = pop(ok_rows, key)
        badv = pop(bad_rows, key)
        # separation at the boundary: largest correct vs smallest wrong
        log(f"== {key}: correct n={len(okv)} max={okv[-1]:.3e} "
            f"(top5 {['%.2e' % x for x in okv[-5:]]}) | wrong n={len(badv)} "
            f"min={badv[0]:.3e} (bottom5 {['%.2e' % x for x in badv[:5]]}) "
            f"| gap {badv[0] / okv[-1]:.2f}x")
        # who sits at the boundary
        top_ok = sorted(ok_rows, key=lambda r: -r[key])[:5]
        low_bad = sorted(bad_rows, key=lambda r: r[key])[:5]
        for r in top_ok:
            log(f"   correct-high {r['name']:24s} {key}={r[key]:.3e} "
                f"fit={r['fit']:.2e} floor={r['floor']:.2e} pn={r['pn']}")
        for r in low_bad:
            log(f"   wrong-low    {r['name']:24s} {key}={r[key]:.3e} "
                f"fit={r['fit']:.2e} floor={r['floor']:.2e} pn={r['pn']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
