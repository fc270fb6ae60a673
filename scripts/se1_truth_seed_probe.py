"""part/se1: is the truth basin reachable from a pure-rotation seed?

The 16^3 trimmed field has no candidate near truth (se1_overlap_candidates:
best pose 0.334). Two hypotheses:
  H1 the field METRIC can't see the basin (truth rotation scores worse
     than the candidates because the crop-biased pre-shape misplaces
     translation/scale, which a rotation-only scan can't correct);
  H2 the trimmed ICP's attraction basin doesn't even contain the
     truth-rotation seed with biased t/s (rotation search can never fix
     the pair).

Test: seed the overlap-mode trimmed similarity ICP at the TRUTH ROTATION
expressed in pre-shape space (rotation of gt_inv o sim0^-1), with the
biased pre-shape t/s, and converge. Also score the trim field AT that
rotation vs the 16 candidates' field errors.

Usage: python scripts/se1_truth_seed_probe.py
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
    )
    from kss_icp_tpu.models.icp import ICPParams, icp
    from kss_icp_tpu.models.kss_icp import resample_pairs, trimmed_fitness
    from kss_icp_tpu.ops.nn import masked_nn_error

    cfg = bench_config()
    ocfg = cfg.escalation_config().overlap_config()
    hard = {p[0]: p for p in partial_corpus(keep=0.8)}
    name, src, tgt, gt = hard["part/se1"]

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

    sim0, _, _ = middle_align(a[0], a[1], a[2], a[3])
    src_al = apply_similarity(sim0, a[0])

    # Truth map src -> tgt frame and its rotation in pre-shape space.
    R = np.asarray(gt["R"], np.float64)
    gt_sim = Similarity(
        scale=jnp.asarray(1.0 / gt["s"], jnp.float32),
        rotation=jnp.asarray(R.T, jnp.float32),
        translation=jnp.asarray(-(R.T @ np.asarray(gt["t"], np.float64))
                                / gt["s"], jnp.float32))
    # D = gt_sim o sim0^-1 : pre-shape frame -> tgt frame. Its rotation is
    # the truth rotation a grid candidate would need.
    s0 = float(sim0.scale)
    R0 = np.asarray(sim0.rotation, np.float64)
    t0v = np.asarray(sim0.translation, np.float64)
    # sim0^-1: x -> (1/s0) R0^T (x - t0)
    Rg = np.asarray(gt_sim.rotation, np.float64)
    R_d = Rg @ R0.T   # rotation of the composition (scales are isotropic)
    log(f"truth rotation in pre-shape space:\n{np.round(R_d, 4)}")

    params = ICPParams.from_config(ocfg, jnp.float32)
    q = ocfg.overlap_trim_fraction

    def converge_from(R_seed, label):
        seed = Similarity.from_rigid(
            jnp.asarray(R_seed, jnp.float32), jnp.zeros(3, jnp.float32))
        rot_src = apply_similarity(seed, src_al)
        res = icp(rot_src, a[1], a[2], a[3], params,
                  precision=ocfg.icp_precision,
                  trim_fraction=ocfg.icp_trim_fraction, estimate_scale=True)
        tot = compose(
            Similarity(scale=res.scale, rotation=res.rotation,
                       translation=res.translation), compose(seed, sim0))
        tfit_bi = float(trimmed_fitness(tot, *a, q))
        pose = transform_rmse(
            np.asarray(apply_similarity(tot, jnp.asarray(src, jnp.float32))),
            src, gt)
        # trim-field error at this rotation (what the field scan sees)
        fe = float(masked_nn_error(
            rot_src[None], a[1][None], a[2][None], a[3][None],
            metric="trim", trim_fraction=ocfg.overlap_trim_fraction)[0])
        log(f"{label}: field_err={fe:.5f} icp_tfit={float(res.fitness):.3e} "
            f"bi_tfit={tfit_bi:.3e} pose={pose:.4f} "
            f"iters={int(res.iterations)}")

    converge_from(R_d, "truth-rotation seed")
    # Nearest 16^3 grid vertex to the truth rotation (what the grid COULD
    # offer): brute-force the grid for the rotation closest in angle.
    from kss_icp_tpu.models.coarse import rotation_grid
    from kss_icp_tpu.core.transforms import euler_xyz_matrix

    grid = rotation_grid(16, ocfg.angle_span)
    rots = np.asarray(euler_xyz_matrix(grid), np.float64)
    tr_dist = np.einsum("kij,ij->k", rots, R_d)  # trace(R_k^T R_d) ~ cos
    best = int(np.argmax(tr_dist))
    ang = np.degrees(np.arccos(np.clip((tr_dist[best] - 1) / 2, -1, 1)))
    log(f"nearest grid vertex: k={best} angular gap {ang:.1f} deg")
    converge_from(rots[best], "nearest-grid seed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
