"""Escalation-pass cost vs chunk size (round 4: the uncapped 16^3 re-solve
is the serving bottleneck at ~2.9 s/launch; its while_loops pay
batch-width x worst-lane iterations, so smaller chunks should cut cost
roughly linearly while keep-better semantics are unchanged)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ksstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def main():
    import bench
    from kss_icp_tpu.stress import golden_corpus, remesh_corpus, stress_corpus

    cfg = bench.bench_config()
    ecfg = cfg.escalation_config()
    _progs = bench.make_programs(); pipeline, measure_all = _progs[0], _progs[1]
    golden = golden_corpus()
    allp = golden + stress_corpus() + [
        (nm, s, t) for nm, s, t, _ in remesh_corpus()]
    nsat = len(allp)

    def pad(pts):
        out = np.zeros((bench.FULL_PAD, 3), np.float32)
        m = np.zeros((bench.FULL_PAD,), bool)
        k = min(len(pts), bench.FULL_PAD)
        out[:k] = pts[:k]
        m[:k] = True
        return out, m

    sp = np.stack([pad(p[1])[0] for p in allp])
    sm = np.stack([pad(p[1])[1] for p in allp])
    tp = np.stack([pad(p[2])[0] for p in allp])
    tm = np.stack([pad(p[2])[1] for p in allp])
    pn = np.array([cfg.resample_count(int(a.sum()), int(t.sum()))
                   for a, t in zip(sm, tm)], np.int32)
    sat = tuple(map(jnp.asarray, (sp, sm, tp, tm, pn)))

    tr, packed = pipeline(*sat, cfg)
    pk = np.asarray(packed)
    fit, hit = pk[:, 0], pk[:, 1] > 0.5
    flags = (fit > cfg.escalate_threshold) | hit
    flagged = np.nonzero(flags)[0]
    print(f"flagged: {flagged.size} -> {[allp[i][0] for i in flagged]}",
          file=sys.stderr)

    import dataclasses
    variants = [("chunk23/uncapped", 23, 0), ("chunk8/uncapped", 8, 0),
                ("chunk8/cap128", 8, 128), ("chunk8/cap64", 8, 64),
                ("chunk8/cap48", 8, 48)]
    rm_ref = None
    for label, chunk, ecap in variants:
        e = dataclasses.replace(ecfg, refine_max_iterations=ecap)
        selp = np.concatenate([flagged, np.repeat(
            flagged[:1], (chunk - flagged.size % chunk) % chunk)])
        # order hard lanes together (descending fitness) so easy chunks
        # finish fast
        order = np.argsort(-fit[selp])
        selp = selp[order]

        def run():
            outs, trs = [], []
            for c0 in range(0, selp.size, chunk):
                cs = selp[c0:c0 + chunk]
                o2 = pipeline(*map(jnp.asarray,
                                   (sp[cs], sm[cs], tp[cs], tm[cs], pn[cs])),
                              e)
                outs.append(np.asarray(o2[1])[:, 0])
                trs.append(jax.tree.map(np.asarray, o2[0]))
            return np.concatenate(outs), trs

        t0 = time.perf_counter()
        f2, trs = run()
        print(f"{label}: first (incl. compile) "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            f2, trs = run()
            times.append(time.perf_counter() - t0)
        # keep-better merged accuracy over flagged rows
        tr_np = jax.tree.map(lambda x: np.array(x), tr)
        fit_m = fit.copy()
        for ci, c0 in enumerate(range(0, selp.size, chunk)):
            cs = selp[c0:c0 + chunk]
            for j, gi in enumerate(cs):
                if f2[c0 + j] < fit_m[gi]:
                    fit_m[gi] = f2[c0 + j]
                    def put(full, new, _g=gi, _j=j):
                        full[_g] = new[_j]
                        return full
                    jax.tree.map(put, tr_np, trs[ci])
        rm = np.asarray(measure_all(jax.tree.map(jnp.asarray, tr_np),
                                    *sat[:4]))
        extra = ""
        if rm_ref is None:
            rm_ref = rm
        else:
            d = rm - rm_ref
            extra = (f" max_delta_vs_ref={d.max():+.5f}"
                     f" (worse rows: {int((d > 1e-4).sum())})")
        print(f"{label}: steady {min(times):.3f}s "
              f"(times={[f'{t:.3f}' for t in times]}), "
              f"median={np.median(rm):.5f} max={rm.max():.5f}{extra}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
