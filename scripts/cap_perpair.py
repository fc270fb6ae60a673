"""Per-pair accuracy audit of the serving cap change (round 4).

For each refine_max_iterations cap, runs the b78 batch + hit-folded
escalation and dumps per-pair RMSE, then prints which pairs differ from
the cap-48 reference and in which direction. Also re-runs the golden tile
ladder at the chosen cap. Run on the TPU.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/ksstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import bench
    from kss_icp_tpu.escalate import escalate_rerun
    from kss_icp_tpu.stress import golden_corpus, remesh_corpus, stress_corpus

    caps = [int(c) for c in (sys.argv[1] if len(sys.argv) > 1
                             else "48,16,12,8").split(",")]
    cfg0 = bench.bench_config()
    ecfg = cfg0.escalation_config()
    _progs = bench.make_programs(); pipeline, measure_all = _progs[0], _progs[1]

    golden = golden_corpus()
    b = len(golden)
    allp = golden + stress_corpus() + [
        (nm, s, t) for nm, s, t, _ in remesh_corpus()]
    names = [p[0] for p in allp]
    nsat = len(allp)

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
    pn = np.array([cfg0.resample_count(int(m1.sum()), int(m2.sum()))
                   for m1, m2 in zip(sm, tm)], np.int32)
    sat = tuple(map(jnp.asarray, (sp, sm, tp, tm, pn)))

    per_cap = {}
    for cap in caps:
        c = dataclasses.replace(cfg0, refine_max_iterations=cap)
        # steady-state timing (min of 3 after warmup)
        tr, packed = pipeline(*sat, c)
        np.asarray(packed)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            tr, packed = pipeline(*sat, c)
            pk = np.asarray(packed)
            times.append(time.perf_counter() - t0)
        fit, hit = pk[:, 0], pk[:, 1] > 0.5
        tr_np = jax.tree.map(np.asarray, tr)

        def resolve(sel):
            o2 = pipeline(*map(jnp.asarray,
                               (sp[sel], sm[sel], tp[sel], tm[sel], pn[sel])),
                          ecfg)
            return o2[0], np.asarray(o2[1])[:, 0]

        flags = (fit > cfg0.escalate_threshold) | hit
        t0 = time.perf_counter()
        tr_np, fit2, _, n_fl = escalate_rerun(
            resolve, fit, cfg0.escalate_threshold, pad_multiple=b,
            result=tr_np, chunk=b, cap=((nsat + b - 1) // b) * b, flags=flags)
        esc_dt = time.perf_counter() - t0
        rm = np.asarray(measure_all(jax.tree.map(jnp.asarray, tr_np),
                                    *sat[:4]))
        rate = nsat / min(times)
        log(f"cap={cap}: {rate:.1f} pairs/s batch, flagged={n_fl}, "
            f"esc={esc_dt:.2f}s, median={np.median(rm):.5f} "
            f"max={rm.max():.5f}")
        per_cap[cap] = rm

    ref = per_cap[caps[0]]
    for cap in caps[1:]:
        d = per_cap[cap] - ref
        moved = np.nonzero(np.abs(d) > 1e-4)[0]
        log(f"--- cap {cap} vs {caps[0]}: {moved.size} pairs moved")
        for i in moved:
            log(f"  {names[i]:16s} {ref[i]:.5f} -> {per_cap[cap][i]:.5f} "
                f"({'better' if d[i] < 0 else 'WORSE'} {abs(d[i]):.5f})")

    print(json.dumps({str(k): v.tolist() for k, v in per_cap.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
