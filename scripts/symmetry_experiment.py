"""Symmetric-pose disambiguation experiment (round 4, VERDICT item 3).

For the failing category-challenge pairs (near-tied symmetric-slide
basins), enumerate EVERY multi-start candidate of the escalation-grade
solve, fully converge each, and print per candidate: ICP fitness, three
secondary scores (max NN distance, 0.95-quantile NN distance, diff =
max - mean), and the ground-truth pose error. Shows whether the true basin
is among the candidates and which secondary metric separates it from the
symmetric impostor when fitness is near-tied.

Usage: python scripts/symmetry_experiment.py [pair-name ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    want = set(sys.argv[1:]) or {"se/2", "rev/1", "box/2", "se/0", "tube/1"}

    from bench import bench_config
    from kss_icp_tpu.challenge import category_corpus, transform_rmse
    from kss_icp_tpu.core.transforms import (
        Similarity as S, apply_similarity, compose, euler_xyz_matrix)
    from kss_icp_tpu.core.preshape import middle_align
    from kss_icp_tpu.models.coarse import coarse_align
    from kss_icp_tpu.models.icp import ICPParams, icp
    from kss_icp_tpu.models.kss_icp import resample_pairs
    from kss_icp_tpu.ops.nn import masked_quantile_threshold, nearest_neighbor

    cfg = bench_config()
    ecfg = cfg.escalation_config()
    FULL = 8192

    def pad(pts):
        out = np.zeros((FULL, 3), np.float32)
        n = min(len(pts), FULL)
        out[:n] = pts[:n]
        m = np.zeros((FULL,), bool)
        m[:n] = True
        return out, m

    @jax.jit
    def solve_all(sp, sm, tp, tm):
        sim0, _, _ = middle_align(sp, sm, tp, tm)
        src_al = apply_similarity(sim0, sp)
        coarse = coarse_align(
            src_al, sm, tp, tm,
            steps=ecfg.rotation_steps, span=ecfg.angle_span,
            radius=ecfg.kernel_radius, max_candidates=ecfg.max_candidates,
            chunk=ecfg.rotation_chunk, precision="highest", backend="xla",
        )
        r_cand = euler_xyz_matrix(coarse.candidate_angles)
        rotated = jnp.einsum("kij,pj->kpi", r_cand, src_al,
                             precision=jax.lax.Precision.HIGHEST)
        params = ICPParams.from_config(ecfg, sp.dtype)
        res = jax.vmap(
            lambda s: icp(s, sm, tp, tm, params, precision="high"))(rotated)

        # per-candidate aligned cloud + NN stats
        def one_stats(rot_s, r_icp, t_icp):
            al = rot_s @ r_icp.T + t_icp
            d2, _ = nearest_neighbor(al, tp, tm)
            d = jnp.sqrt(d2)
            w = sm.astype(d.dtype)
            mean = jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)
            mx = jnp.max(jnp.where(sm, d, -1.0))
            q95 = masked_quantile_threshold(d, sm, 0.95)
            return mean, mx, q95

        mean, mx, q95 = jax.vmap(one_stats)(rotated, res.rotation, res.translation)
        return coarse, r_cand, res, sim0, mean, mx, q95

    for name, src, tgt, gt in category_corpus():
        if name not in want:
            continue
        sp_, sm_ = pad(src)
        tp_, tm_ = pad(tgt)
        pn = np.int32(cfg.resample_count(int(sm_.sum()), int(tm_.sum())))
        (rs, rsm), (rt, rtm) = resample_pairs(
            sp_[None], sm_[None], tp_[None], tm_[None], jnp.asarray([pn]), cfg)
        coarse, r_cand, res, sim0, mean, mx, q95 = solve_all(
            rs[0], rsm[0], rt[0], rtm[0])
        cm = np.asarray(coarse.candidate_mask)
        fit = np.asarray(res.fitness)
        order = np.argsort(np.where(cm, fit, 1e30))
        print(f"=== {name} (candidates={int(cm.sum())}) ===")
        print(f"{'k':>3s} {'fitness':>10s} {'mean':>8s} {'max':>8s} "
              f"{'q95':>8s} {'pose':>8s}")
        for k in order[:8]:
            icp_sim = S.from_rigid(res.rotation[k], res.translation[k])
            cand_sim = S.from_rigid(r_cand[k], jnp.zeros((3,), jnp.float32))
            total = compose(icp_sim, compose(cand_sim, sim0))
            al = np.asarray(apply_similarity(
                total, jnp.asarray(src, jnp.float32)))
            pose = transform_rmse(al, src, gt)
            print(f"{k:3d} {fit[k]:10.3e} {np.asarray(mean)[k]:8.4f} "
                  f"{np.asarray(mx)[k]:8.4f} {np.asarray(q95)[k]:8.4f} "
                  f"{pose:8.4f}")


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.1f}s", file=sys.stderr)
