"""TPU serving-throughput sweep (round 4, VERDICT r3 items 2 & 5).

Measures the saturated 78-pair batch at several refine_max_iterations caps
(the difficulty-bucketing lever: with the hit-cap -> escalation fold, a
capped-out lane is ALWAYS finished by the uncapped 16^3 re-solve, so
lowering the cap no longer risks silent degradation — the r3 rejection of
cap 32 was about exactly that silence), and the golden-tile batch-growth
ceiling at the shipping config (the stale 211-pairs/s row predates cap 48
+ the exact-f32 gate).

Writes /tmp/serving_sweep.json and prints a table. Run on the TPU:
  nohup python scripts/serving_sweep.py > /tmp/serving_sweep.log 2>&1 &

Options:
  --caps 48,32,24,16     caps to measure (default)
  --tiles 1,2,4,8        golden-tile batch multiples for the ceiling sweep
  --skip-caps / --skip-tiles
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

    args = sys.argv[1:]

    def opt(name, default):
        if name in args:
            return args[args.index(name) + 1]
        return default

    caps = [int(c) for c in opt("--caps", "48,32,24,16").split(",")]
    tiles = [int(t) for t in opt("--tiles", "1,2,4,8").split(",")]

    cfg0 = bench.bench_config()
    _progs = bench.make_programs(); pipeline, measure_all = _progs[0], _progs[1]

    golden = golden_corpus()
    b = len(golden)
    stress = stress_corpus()
    remesh = [(nm, s, t) for nm, s, t, _ in remesh_corpus()]
    allp = golden + stress + remesh
    nsat = len(allp)
    log(f"corpora: golden={b} stress={len(stress)} remesh={len(remesh)}")

    def pad(pts):
        out = np.zeros((bench.FULL_PAD, 3), np.float32)
        n = min(len(pts), bench.FULL_PAD)
        out[:n] = pts[:n]
        m = np.zeros((bench.FULL_PAD,), bool)
        m[:n] = True
        return out, m

    def batch_arrays(corpus, c):
        sp = np.stack([pad(p[1])[0] for p in corpus])
        sm = np.stack([pad(p[1])[1] for p in corpus])
        tp = np.stack([pad(p[2])[0] for p in corpus])
        tm = np.stack([pad(p[2])[1] for p in corpus])
        pn = np.array([c.resample_count(int(m1.sum()), int(m2.sum()))
                       for m1, m2 in zip(sm, tm)], np.int32)
        return sp, sm, tp, tm, pn

    sat_np = batch_arrays(allp, cfg0)
    sat = tuple(map(jnp.asarray, sat_np))
    results = {"caps": [], "tiles": []}

    def run_once(a, c):
        tr, packed = pipeline(*a, c)
        pk = np.asarray(packed)
        return tr, pk[:, 0], pk[:, 1] > 0.5

    def timed(a, c, n_pairs, label, repeat=3):
        t0 = time.perf_counter()
        out = run_once(a, c)
        log(f"{label} first run (incl. compile): "
            f"{time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            out = run_once(a, c)
            times.append(time.perf_counter() - t0)
        rate = n_pairs / min(times)
        log(f"{label}: times={[f'{t:.3f}' for t in times]} -> "
            f"{rate:.1f} pairs/s")
        return out, rate

    if "--skip-caps" not in args:
        ecfg = cfg0.escalation_config()
        rmse_ref = None
        for cap in caps:
            c = dataclasses.replace(cfg0, refine_max_iterations=cap)
            out, rate = timed(sat, c, nsat, f"b{nsat} cap={cap}")
            tr, fit, hit = out
            tr_np = jax.tree.map(np.asarray, tr)

            # The full serving solve includes finishing flagged lanes on
            # the escalation grid (hit-cap folded in); time that too.
            sp, sm_, tp, tm_, pn = sat_np

            def resolve(sel):
                o2 = pipeline(*map(jnp.asarray,
                                   (sp[sel], sm_[sel], tp[sel], tm_[sel],
                                    pn[sel])), ecfg)
                return o2[0], np.asarray(o2[1])[:, 0]

            t0 = time.perf_counter()
            flags = (fit > cfg0.escalate_threshold) | hit
            tr_np, fit2, _, n_fl = escalate_rerun(
                resolve, fit, cfg0.escalate_threshold, pad_multiple=b,
                result=tr_np, chunk=b, cap=((nsat + b - 1) // b) * b,
                flags=flags)
            esc_dt = time.perf_counter() - t0
            # end-to-end rate incl. amortized escalation (steady state: the
            # escalation program is compiled, so re-time one resolve pass)
            t0 = time.perf_counter()
            esc_steady = 0.0
            if flags.any():
                sel = np.nonzero(flags)[0]
                sel = np.concatenate(
                    [sel, np.repeat(sel[:1], (b - sel.size % b) % b)])
                for c0 in range(0, sel.size, b):
                    resolve(sel[c0:c0 + b])
                esc_steady = time.perf_counter() - t0
            total_rate = nsat / (nsat / rate + esc_steady)
            rm = np.asarray(measure_all(
                jax.tree.map(jnp.asarray, tr_np), *sat[:4]))
            row = {"cap": cap, "pairs_per_sec_batch": round(rate, 2),
                   "hit_lanes": int(hit.sum()), "escalated": int(n_fl),
                   "esc_first_s": round(esc_dt, 2),
                   "esc_steady_s": round(esc_steady, 3),
                   "pairs_per_sec_total": round(total_rate, 2),
                   "median_rmse": round(float(np.median(rm)), 6),
                   "max_rmse": round(float(rm.max()), 6)}
            if rmse_ref is None:
                rmse_ref = rm
                row["rmse_delta_vs_cap48"] = 0.0
            else:
                row["rmse_delta_vs_cap48"] = round(
                    float(np.abs(rm - rmse_ref).max()), 6)
            results["caps"].append(row)
            log(f"cap={cap}: {json.dumps(row)}")

    if "--skip-tiles" not in args:
        for t in tiles:
            corpus = golden * t
            n = len(corpus)
            a = tuple(map(jnp.asarray, batch_arrays(corpus, cfg0)))
            _, rate = timed(a, cfg0, n, f"golden x{t} (b{n})")
            results["tiles"].append(
                {"tile": t, "batch": n, "pairs_per_sec": round(rate, 2)})

    out_path = Path("/tmp/serving_sweep.json")
    out_path.write_text(json.dumps(results, indent=1))
    log(f"wrote {out_path}")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
