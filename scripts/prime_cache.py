"""AOT-prime the persistent XLA compilation cache for bench.py.

The fused full-pipeline program costs minutes to compile through the TPU
tunnel (BASELINE.md "Cold-compile cost"); this script compiles every
program bench.py will run — the batch-B golden pipeline, the saturated
batch, the escalation re-solve and the measure program — via
``jit(...).lower(shapes).compile()`` (no input data, no execution) into the
persistent cache at /tmp/ksstpu_jax_cache, so a fresh machine reaches
bench steady state in ONE priming run and the bench's own first run loads
from cache in seconds.

The programs are built by bench.make_programs()/bench.bench_config() —
the exact objects bench.py jits — so the cache keys match by construction.

Usage: python scripts/prime_cache.py            # prime bench programs
       python scripts/prime_cache.py --entry    # also prime __graft_entry__
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

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import bench
    from kss_icp_tpu.stress import golden_corpus, remesh_corpus, stress_corpus

    b = len(golden_corpus()) or 23
    try:
        nsat = b + len(stress_corpus()) + len(remesh_corpus())
    except Exception:
        nsat = None
    cfg = bench.bench_config()
    ecfg = cfg.escalation_config()
    (pipeline, measure_all, polish, overlap, trimmed_probe, finish,
     overlap_screen) = bench.make_programs()

    f32 = jax.ShapeDtypeStruct
    P = bench.FULL_PAD

    def shapes(n):
        return (f32((n, P, 3), np.float32), f32((n, P), bool),
                f32((n, P, 3), np.float32), f32((n, P), bool),
                f32((n,), np.int32))

    total0 = time.perf_counter()
    done = []
    # Pipeline programs: golden batch, saturated batch, and the
    # escalation re-solve at its escalate_pad chunk shape.
    for n in [b] + ([nsat] if nsat and nsat != b else []):
        t0 = time.perf_counter()
        pipeline.lower(*shapes(n), cfg).compile()
        dt = time.perf_counter() - t0
        done.append((f"pipeline batch-{n}", dt))
        log(f"primed pipeline batch-{n}: {dt:.1f}s")
    t0 = time.perf_counter()
    pipeline.lower(*shapes(bench.ESC_CHUNK), ecfg).compile()
    dt = time.perf_counter() - t0
    done.append((f"escalation pipeline batch-{bench.ESC_CHUNK}", dt))
    log(f"primed escalation pipeline batch-{bench.ESC_CHUNK}: {dt:.1f}s")

    # Measure program (transform is a Similarity pytree).
    from kss_icp_tpu.core.transforms import Similarity

    tr = Similarity(
        scale=f32((b,), np.float32),
        rotation=f32((b, 3, 3), np.float32),
        translation=f32((b, 3), np.float32),
    )
    t0 = time.perf_counter()
    measure_all.lower(tr, *shapes(b)[:4]).compile()
    dt = time.perf_counter() - t0
    done.append((f"measure batch-{b}", dt))
    log(f"primed measure batch-{b}: {dt:.1f}s")

    # Polish programs (two-stage converge): selection sizes are padded to
    # multiples of escalate_pad; prime the first few rungs of that ladder
    # for both batch shapes.
    if cfg.refine_polish_iterations and cfg.refine_max_iterations:
        for n in [b] + ([nsat] if nsat and nsat != b else []):
            tr_n = Similarity(
                scale=f32((n,), np.float32),
                rotation=f32((n, 3, 3), np.float32),
                translation=f32((n, 3), np.float32),
            )
            for k in range(cfg.escalate_pad, min(4 * cfg.escalate_pad, n) + 1,
                           cfg.escalate_pad):
                t0 = time.perf_counter()
                polish.lower(f32((k,), np.int32), *shapes(n), tr_n,
                             cfg).compile()
                dt = time.perf_counter() - t0
                done.append((f"polish {k}-of-{n}", dt))
                log(f"primed polish {k}-of-{n}: {dt:.1f}s")

    # Finisher program (ADVICE r4: uncapped continuation of lanes still
    # hit-capped after the escalation merge) — pre-gathered escalate_pad
    # chunk, escalation config.
    k = cfg.escalate_pad
    tr_fin = Similarity(
        scale=f32((k,), np.float32),
        rotation=f32((k, 3, 3), np.float32),
        translation=f32((k, 3), np.float32),
    )
    t0 = time.perf_counter()
    finish.lower(*shapes(k), tr_fin, ecfg).compile()
    done.append(("finisher", time.perf_counter() - t0))
    log(f"primed finisher: {done[-1][1]:.1f}s")

    # Overlap-tier program (one escalate_pad-sized chunk per batch shape):
    # the 16^3 x overlap_iterations solve only fires for pairs still
    # fitness-flagged after escalation, but when it does the compile is the
    # heaviest in the bench — prime it.
    if cfg.overlap_escalate:
        # One shape serves every corpus: inputs are pre-gathered to the
        # escalate_pad chunk size.
        k = cfg.escalate_pad
        tr_k = Similarity(
            scale=f32((k,), np.float32),
            rotation=f32((k, 3, 3), np.float32),
            translation=f32((k, 3), np.float32),
        )
        t0 = time.perf_counter()
        trimmed_probe.lower(*shapes(k), tr_k, cfg).compile()
        done.append(("trimmed probe", time.perf_counter() - t0))
        log(f"primed trimmed probe: {done[-1][1]:.1f}s")
        for ocfg in (cfg.overlap_config(), ecfg.overlap_config()):
            t0 = time.perf_counter()
            overlap.lower(*shapes(k), tr_k, ocfg).compile()
            dt = time.perf_counter() - t0
            tag = f"overlap {ocfg.rotation_steps}^3 batch-{k}"
            done.append((tag, dt))
            log(f"primed {tag}: {dt:.1f}s")
        if cfg.overlap_screen_rung:
            t0 = time.perf_counter()
            overlap_screen.lower(*shapes(k), tr_k,
                                 cfg.overlap_config()).compile()
            dt = time.perf_counter() - t0
            done.append((f"overlap screen rung batch-{k}", dt))
            log(f"primed overlap screen rung batch-{k}: {dt:.1f}s")

    if "--entry" in sys.argv:
        import __graft_entry__ as g

        fn, ex = g.entry()
        t0 = time.perf_counter()
        jax.jit(fn).lower(*ex).compile()
        done.append(("graft entry", time.perf_counter() - t0))
        log(f"primed graft entry: {done[-1][1]:.1f}s")

    log(f"total priming time: {time.perf_counter() - total0:.1f}s "
        f"({len(done)} programs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
