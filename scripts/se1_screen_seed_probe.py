"""Screen-over-grid seeding for the overlap rung (round 5).

se1_truth_seed_probe showed the trimmed-ICP attraction basin contains
pure-rotation seeds 9 deg from truth, but the rotation-only trim field
(crop-biased t/s) ranks that region worse than every candidate — the
FIELD is the wrong selector under heavy crops. This probes the fix: run
a SHORT trimmed similarity ICP (the screen pattern: capped iterations,
512-prefix source) from EVERY grid rotation, rank by bidirectional
trimmed fitness of the screened pose, fully converge the top few.

Questions: (1) is the truth basin reachable from the nearest 8^3 vertex
(18 deg) or only 16^3 (9 deg)? (2) how many screen iterations until the
truth seed ranks top-3? (3) wall cost per pair. Run over ALL hard-tier
pairs to check the strategy generalizes (it must not break the 7 already
solved).

Usage: python scripts/se1_screen_seed_probe.py [--steps 8] [--iters 8]
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
    from functools import partial as fpartial

    from bench import bench_config
    from kss_icp_tpu.challenge import partial_corpus, transform_rmse
    from kss_icp_tpu.core.preshape import middle_align
    from kss_icp_tpu.core.transforms import (
        Similarity,
        apply_similarity,
        compose,
        euler_xyz_matrix,
    )
    from kss_icp_tpu.models.coarse import rotation_grid
    from kss_icp_tpu.models.icp import ICPParams, icp
    from kss_icp_tpu.models.kss_icp import resample_pairs, trimmed_fitness
    from kss_icp_tpu.ops.nn import nearest_neighbor, trimmed_masked_mean

    steps = int(sys.argv[sys.argv.index("--steps") + 1]) \
        if "--steps" in sys.argv else 8
    screen_iters = int(sys.argv[sys.argv.index("--iters") + 1]) \
        if "--iters" in sys.argv else 8

    cfg = bench_config()
    ocfg = cfg.escalation_config().overlap_config()
    q = ocfg.overlap_trim_fraction
    params = ICPParams.from_config(ocfg, jnp.float32)
    sparams = params._replace(
        max_iterations=jnp.asarray(screen_iters, jnp.int32))

    grid = rotation_grid(steps, ocfg.angle_span)
    rots = euler_xyz_matrix(grid)          # (C, 3, 3)
    C = rots.shape[0]

    @fpartial(jax.jit, static_argnames=())
    def screen_all(src_al, smask, tgt, tmask):
        # Short trimmed sim ICP from every rotation on the 512-prefix
        # source (FPS order = uniform subsample), then score each screened
        # pose by BIDIRECTIONAL trimmed fitness at full resolution.
        pre = src_al[:512]
        prem = smask[:512]

        def one(r):
            rot = pre @ r.T
            res = icp(rot, prem, tgt, tmask, sparams,
                      precision=ocfg.icp_precision,
                      trim_fraction=ocfg.icp_trim_fraction,
                      estimate_scale=True)
            # bidirectional trimmed fitness of the screened pose on the
            # FULL clouds (the adoption metric).
            full = (res.scale * ((src_al @ r.T) @ res.rotation.T)
                    + res.translation)
            d2, _ = nearest_neighbor(full, tgt, tmask)
            fwd = trimmed_masked_mean(d2, smask, q)
            d2r, _ = nearest_neighbor(tgt, full, smask)
            rev = trimmed_masked_mean(d2r, tmask, q)
            return fwd + rev, res.rotation, res.translation, res.scale

        return jax.lax.map(one, rots, batch_size=64)

    hard = partial_corpus(keep=0.8)
    for name, src, tgt_pts, gt in hard:
        pad = 8192
        sp = np.zeros((1, pad, 3), np.float32)
        sp[0, : len(src)] = src[:pad]
        sm = np.zeros((1, pad), bool)
        sm[0, : min(len(src), pad)] = True
        tp = np.zeros((1, pad, 3), np.float32)
        tp[0, : len(tgt_pts)] = tgt_pts[:pad]
        tm = np.zeros((1, pad), bool)
        tm[0, : min(len(tgt_pts), pad)] = True
        pn = jnp.asarray(
            [cfg.resample_count(len(src), len(tgt_pts))], jnp.int32)
        (rs, rsm), (rt, rtm) = resample_pairs(
            jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp),
            jnp.asarray(tm), pn, cfg)
        a = (rs[0], rsm[0], rt[0], rtm[0])
        sim0, _, _ = middle_align(*a)
        src_al = apply_similarity(sim0, a[0])

        t0 = time.perf_counter()
        tfit, rR, rT, rS = screen_all(src_al, a[1], a[2], a[3])
        tfit = np.asarray(tfit)
        dt_screen = time.perf_counter() - t0

        order = np.argsort(tfit)
        best_pose, best_tfit, best_k = None, None, None
        t1 = time.perf_counter()
        for k in order[:3]:
            seed = Similarity.from_rigid(rots[int(k)],
                                         jnp.zeros(3, jnp.float32))
            rot_src = apply_similarity(seed, src_al)
            res = icp(rot_src, a[1], a[2], a[3], params,
                      precision=ocfg.icp_precision,
                      trim_fraction=ocfg.icp_trim_fraction,
                      estimate_scale=True)
            tot = compose(
                Similarity(scale=res.scale, rotation=res.rotation,
                           translation=res.translation),
                compose(seed, sim0))
            tb = float(trimmed_fitness(tot, *a, q))
            if best_tfit is None or tb < best_tfit:
                pose = transform_rmse(
                    np.asarray(apply_similarity(
                        tot, jnp.asarray(src, jnp.float32))), src, gt)
                best_pose, best_tfit, best_k = pose, tb, int(k)
        dt_conv = time.perf_counter() - t1
        log(f"{name:12s} screen {dt_screen:.2f}s converge {dt_conv:.2f}s | "
            f"top3 tfit {tfit[order[0]]:.3e}/{tfit[order[1]]:.3e}/"
            f"{tfit[order[2]]:.3e} | best pose={best_pose:.4f} "
            f"(k={best_k}, bi_tfit={best_tfit:.3e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
