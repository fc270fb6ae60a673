"""part/se1 overlap-rung candidate enumeration (round 5).

The overlap-mode ICP warm-started at TRUTH stays at pose 0.010 / trimmed
fitness 5.4e-4, yet the shipping 16^3x3 overlap rung lands at pose ~0.33
— so the basin exists and wins on trimmed fitness IF reached. This probe
asks where the seeding loses it: enumerate the trimmed coarse field's
candidates (the overlap solve's multi-start seeds, crop-biased pre-shape
and all), converge each with the trimmed similarity ICP, and print each
candidate's trimmed fitness + pose. If no candidate reaches the truth
basin, the trim field at 16^3 has no minimum near it (seeding gap); if
one does but ranks below the shipped pick, the selection is at fault.

Usage: python scripts/se1_overlap_candidates.py [pair] [--steps 16]
"""

from __future__ import annotations

import sys
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
    from bench import bench_config
    from kss_icp_tpu.challenge import partial_corpus, transform_rmse
    from kss_icp_tpu.core.preshape import middle_align
    from kss_icp_tpu.core.transforms import (
        Similarity,
        apply_similarity,
        compose,
        euler_xyz_matrix,
    )
    from kss_icp_tpu.models.coarse import coarse_align
    from kss_icp_tpu.models.icp import ICPParams, icp
    from kss_icp_tpu.models.kss_icp import resample_pairs, trimmed_fitness

    want = next((a for a in sys.argv[1:] if not a.startswith("--")),
                "part/se1")
    steps = 16
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])

    cfg = bench_config()
    ocfg = cfg.escalation_config().overlap_config()
    hard = {p[0]: p for p in partial_corpus(keep=0.8)}
    name, src, tgt, gt = hard[want]

    pad = 8192
    sp = np.zeros((1, pad, 3), np.float32)
    sp[0, : len(src)] = src[:pad]
    sm = np.zeros((1, pad), bool)
    sm[0, : min(len(src), pad)] = True
    tp = np.zeros((1, pad, 3), np.float32)
    tp[0, : len(tgt)] = tgt[:pad]
    tm = np.zeros((1, pad), bool)
    tm[0, : min(len(tgt), pad)] = True
    pn = jnp.asarray([cfg.resample_count(len(src), len(tgt))], jnp.int32)
    (rs, rsm), (rt, rtm) = resample_pairs(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        pn, cfg)
    a = (rs[0], rsm[0], rt[0], rtm[0])

    # Overlap-mode pre-shape + trimmed coarse field (the rung's stage 1,
    # no inlier iteration), candidates converged with trimmed sim ICP.
    sim0, _, _ = middle_align(a[0], a[1], a[2], a[3])
    src_al = apply_similarity(sim0, a[0])
    coarse = coarse_align(
        src_al, a[1], a[2], a[3], steps=steps, span=ocfg.angle_span,
        radius=ocfg.kernel_radius, max_candidates=32,
        chunk=ocfg.rotation_chunk, precision=ocfg.coarse_precision,
        backend="xla", method=ocfg.coarse_method,
        error_metric="trim", trim_fraction=ocfg.overlap_trim_fraction)
    cmask = np.asarray(coarse.candidate_mask)
    angles = np.asarray(coarse.candidate_angles)
    k_valid = int(cmask.sum())
    log(f"=== {name} trim field {steps}^3: {k_valid} candidates ===")

    params = ICPParams.from_config(ocfg, jnp.float32)
    r_cand = euler_xyz_matrix(jnp.asarray(angles))
    rows = []
    q = ocfg.overlap_trim_fraction
    for k in range(k_valid):
        rot_src = apply_similarity(
            Similarity.from_rigid(r_cand[k], jnp.zeros(3, jnp.float32)),
            src_al)
        res = icp(rot_src, a[1], a[2], a[3], params,
                  precision=ocfg.icp_precision,
                  trim_fraction=ocfg.icp_trim_fraction, estimate_scale=True)
        tot = compose(
            Similarity(scale=res.scale, rotation=res.rotation,
                       translation=res.translation),
            compose(Similarity.from_rigid(r_cand[k], jnp.zeros(3, jnp.float32)),
                    sim0))
        tfit_bi = float(trimmed_fitness(tot, *a, q))
        pose = transform_rmse(
            np.asarray(apply_similarity(tot, jnp.asarray(src, jnp.float32))),
            src, gt)
        rows.append((k, float(coarse.candidate_errors[k]),
                     float(res.fitness), tfit_bi, pose))
    rows.sort(key=lambda r: r[3])
    log("  k  field_err   icp_tfit    bi_tfit     pose")
    for k, fe, ft, tb, po in rows[:12]:
        log(f" {k:2d}  {fe:.5f}   {ft:.3e}  {tb:.3e}  {po:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
