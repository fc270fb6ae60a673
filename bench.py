"""Benchmark: batched KSS-ICP registration throughput on one TPU chip.

Protocol (the reference's own benchmark shape, Main_KSS_List.cpp:151-179):
register every bundled golden pair — data/registration (10 models) plus
data/registration_scale (13 models, scale-perturbed) — <name>.gird source
onto <name>.wlop target, full pipeline per pair: FPS resample to 2000 pts,
pre-shape align (recovers the scale), 512-rotation coarse search,
multi-start ICP — batched and jitted as one program. Prints ONE JSON line:
  {"metric": ..., "value": pairs/s/chip, "unit": "pairs/s", "vs_baseline": x}

Baseline: MEASURED by the CPU oracle (kss_icp_tpu/oracle.py, a faithful
numpy/scipy replica of the reference pipeline) — scripts/measure_baseline.py
writes BASELINE_ORACLE.json and this script reads pairs_per_sec from it.
Falls back to the 0.1 pairs/s estimate (single pair ~10 s on a desktop CPU
per the reference's own clock() protocol) if the oracle file is absent.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

_ORACLE_JSON = Path(__file__).resolve().parent / "BASELINE_ORACLE.json"


def reference_pairs_per_sec() -> tuple[float, str]:
    if _ORACLE_JSON.exists():
        try:
            v = json.loads(_ORACLE_JSON.read_text())["pairs_per_sec"]
            return float(v), "measured (CPU oracle, BASELINE_ORACLE.json)"
        except (KeyError, ValueError, TypeError):
            pass
    return 0.1, "estimate (no BASELINE_ORACLE.json)"


FULL_PAD = 8192
REPEAT = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_pairs():
    from kss_icp_tpu.stress import golden_corpus

    pairs = golden_corpus()
    if not pairs:  # fallback: synthetic wavy-surface pairs
        rng = np.random.default_rng(0)
        for i in range(8):
            u = rng.uniform(-1, 1, (5000,))
            v = rng.uniform(-1, 1, (5000,))
            tgt = np.stack([u, v, 0.3 * np.sin(3 * u) * np.cos(2 * v)], -1)
            ang = rng.uniform(0, 2 * np.pi)
            c, s = np.cos(ang), np.sin(ang)
            r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            pairs.append((f"synth{i}", tgt @ r.T, tgt))
    return pairs


def main() -> int:
    import jax

    # Persistent compilation cache: the full-pipeline XLA program takes
    # minutes to compile; cache it across bench runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/ksstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from kss_icp_tpu.config import KSSICPConfig
    from kss_icp_tpu.core.transforms import apply_similarity
    from kss_icp_tpu.metrics import registration_measure_padded
    from kss_icp_tpu.models.kss_icp import register_resampled, resample_pairs

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    # Tuned knobs, validated RMSE-identical per pair on the 10 registration
    # + 13 registration_scale golden pairs (BASELINE.md): 6 multi-start
    # candidates (reference keeps all ~30 local minima; the top-6 by field
    # error always contains the winner, and auto-escalation is the safety
    # net beyond that), rotation field scored on 512-point FPS prefixes of
    # BOTH clouds (ranking-only stage), 2 full-resolution refinements after
    # screening. Measured ladder in BASELINE.md (round 2: 118 -> 164 pairs/s).
    # refine_tier_iterations=12: all refine lanes run a capped 12-iteration
    # solve, only the winner converges fully (+9% — the 49-iteration
    # while_loop tail is paid by one lane, not two). Worst per-pair RMSE
    # delta +0.0016, inside measured multi-start run-to-run noise.
    cfg = KSSICPConfig(max_candidates=6, coarse_points=512,
                       coarse_target_points=512, refine_candidates=2,
                       refine_tier_iterations=12)
    pairs = load_pairs()
    b = len(pairs)
    log(f"pairs: {b} -> {[p[0] for p in pairs]}")

    def pad(pts):
        out = np.zeros((FULL_PAD, 3), np.float32)
        n = min(len(pts), FULL_PAD)
        out[:n] = pts[:n]
        m = np.zeros((FULL_PAD,), bool)
        m[:n] = True
        return out, m

    src = np.stack([pad(p[1])[0] for p in pairs])
    sm = np.stack([pad(p[1])[1] for p in pairs])
    tgt = np.stack([pad(p[2])[0] for p in pairs])
    tm = np.stack([pad(p[2])[1] for p in pairs])
    pnum = np.array(
        [cfg.resample_count(int(m1.sum()), int(m2.sum())) for m1, m2 in zip(sm, tm)],
        np.int32,
    )

    @partial(jax.jit, static_argnames=("cfg",))
    def pipeline(sp, sm_, tp, tm_, pn, cfg):
        (rs, rsm), (rt, rtm) = resample_pairs(sp, sm_, tp, tm_, pn, cfg)

        def one(spi, smi, tpi, tmi):
            res = register_resampled(spi, smi, tpi, tmi, cfg)
            return res.transform, res.fitness

        return jax.vmap(one)(rs, rsm, rt, rtm)

    args = tuple(map(jnp.asarray, (src, sm, tgt, tm, pnum)))

    def run_to_completion():
        out = pipeline(*args, cfg)
        # Force a device->host transfer: on the tunneled axon platform
        # block_until_ready returns before execution finishes, so pulling
        # the (tiny) fitness vector is the only reliable fence.
        np.asarray(out[1])
        return out

    log("compiling...")
    t0 = time.perf_counter()
    out = run_to_completion()
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    times = []
    for i in range(REPEAT):
        t0 = time.perf_counter()
        out = run_to_completion()
        times.append(time.perf_counter() - t0)
    best = min(times)
    pairs_per_sec = b / best
    log(f"times: {[f'{t:.3f}' for t in times]} -> {pairs_per_sec:.2f} pairs/s")

    # Accuracy sanity: full-res RMSE per pair, one batched jitted call.
    transform, fitness = out

    @jax.jit
    def measure_all(tr, sp, sm_, tp, tm_):
        def one(tri, spi, smi, tpi, tmi):
            aligned = apply_similarity(tri, spi)
            return registration_measure_padded(aligned, smi, tpi, tmi)["rmse"]

        return jax.vmap(one)(tr, sp, sm_, tp, tm_)

    rmses = np.asarray(measure_all(transform, *args[:4])).tolist()
    fit_np = np.asarray(fitness)
    for i, (name, _, _) in enumerate(pairs):
        log(f"  {name:10s} rmse={rmses[i]:.5f} fitness={fit_np[i]:.6f}")

    # Extra corpora run through the SAME compiled program in batch-b chunks,
    # with fitness-flagged pairs auto-escalated to the 16^3 grid (one extra
    # program, persistent-cached). Reported in the bench JSON:
    #   - stress: 30 adversarial compound-rotation pairs (robustness);
    #   - remesh: 25 perturbed Remesh/Advancing OFF models (wider accuracy).
    def _row_set(full, i, row):
        full = full.copy()
        full[i] = row
        return full

    def run_corpus(corpus, label, threshold=0.05):
        n = len(corpus)
        chunks = (n + b - 1) // b
        total = chunks * b
        idx = np.concatenate([np.arange(n), np.zeros(total - n, np.int64)])
        sp = np.stack([pad(corpus[i][1])[0] for i in idx])
        spm = np.stack([pad(corpus[i][1])[1] for i in idx])
        tp = np.stack([pad(corpus[i][2])[0] for i in idx])
        tpm = np.stack([pad(corpus[i][2])[1] for i in idx])
        pn = np.array(
            [cfg.resample_count(int(m1.sum()), int(m2.sum()))
             for m1, m2 in zip(spm, tpm)], np.int32)
        t0 = time.perf_counter()
        tr_parts, fit_parts = [], []
        for c in range(chunks):
            sl = slice(c * b, (c + 1) * b)
            out_c = pipeline(*map(jnp.asarray, (sp[sl], spm[sl], tp[sl], tpm[sl], pn[sl])), cfg)
            tr_parts.append(out_c[0])
            fit_parts.append(np.asarray(out_c[1]))
        fit_s = np.concatenate(fit_parts)
        tr_np = jax.tree.map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *tr_parts)
        flagged = np.nonzero(fit_s[:n] > cfg.escalate_threshold)[0]
        if flagged.size:
            ecfg = cfg.escalation_config()
            tot2 = ((flagged.size + b - 1) // b) * b
            sel = np.concatenate([flagged, np.repeat(flagged[:1], tot2 - flagged.size)])
            for c in range(tot2 // b):
                ssl = sel[c * b:(c + 1) * b]
                out2 = pipeline(*map(jnp.asarray,
                                     (sp[ssl], spm[ssl], tp[ssl], tpm[ssl], pn[ssl])), ecfg)
                f2 = np.asarray(out2[1])
                tr2 = jax.tree.map(np.asarray, out2[0])
                for j, gi in enumerate(ssl):
                    if f2[j] < fit_s[gi]:
                        fit_s[gi] = f2[j]
                        tr_np = jax.tree.map(
                            lambda full, new: _row_set(full, gi, new[j]),
                            tr_np, tr2)
        rm_parts = []
        for c in range(chunks):
            sl = slice(c * b, (c + 1) * b)
            tr_c = jax.tree.map(lambda x: jnp.asarray(x[sl]), tr_np)
            rm_parts.append(np.asarray(measure_all(
                tr_c, *map(jnp.asarray, (sp[sl], spm[sl], tp[sl], tpm[sl])))))
        rm = np.concatenate(rm_parts)[:n]
        corpus_dt = time.perf_counter() - t0
        fails = [corpus[i][0] for i in np.nonzero(rm > threshold)[0]]
        log(f"{label}: {n} pairs, escalated={flagged.size}, "
            f"failures={len(fails)} {fails}, median rmse={np.median(rm):.5f}, "
            f"{corpus_dt:.1f}s (incl. escalation compile on first run)")
        return {
            f"{label}_pairs": n,
            f"{label}_escalated": int(flagged.size),
            f"{label}_failures": len(fails),
            f"{label}_success_rate": round(1.0 - len(fails) / n, 4),
            f"{label}_median_rmse": round(float(np.median(rm)), 6),
        }

    extra_results = {}
    try:
        from kss_icp_tpu.stress import remesh_corpus, stress_corpus

        extra_results.update(run_corpus(stress_corpus(), "stress"))
        extra_results.update(run_corpus(
            [(nm, s, t) for nm, s, t, _ in remesh_corpus()], "remesh"))
    except Exception as e:  # corpus data unavailable -> skip, don't fail bench
        log(f"extra corpus unavailable: {e}")

    base_rate, base_src = reference_pairs_per_sec()
    result = {
        "metric": "registration_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 4),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / base_rate, 2),
        "baseline_pairs_per_sec": base_rate,
        "baseline_source": base_src,
        "batch": b,
        "median_rmse": round(float(np.median(rmses)), 6),
        **extra_results,
    }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
