"""Where does the true basin rank in the escalation tier's SCREEN stage?
(round 4 follow-up to symmetry_experiment: full-converge fitness ranks the
true pose first for rev/1 and box/2, yet the shipping two-phase pipeline
fails them — hypothesis: the 20-iteration 512-point screen misranks it
below refine_candidates=4.)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    sys.argv.remove("--tpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/ksstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def main():
    want = set(sys.argv[1:]) or {"rev/1", "box/2", "se/2", "tube/1"}

    from bench import bench_config
    from kss_icp_tpu.challenge import category_corpus, transform_rmse
    from kss_icp_tpu.core.transforms import (
        Similarity as S, apply_similarity, compose, euler_xyz_matrix)
    from kss_icp_tpu.core.preshape import middle_align
    from kss_icp_tpu.models.coarse import coarse_align
    from kss_icp_tpu.models.icp import ICPParams, icp
    from kss_icp_tpu.models.kss_icp import resample_pairs

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
    def screen_and_full(sp, sm, tp, tm):
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
        # the shipping escalation screen: 20 iterations on the 512-pt prefix
        sp_n = ecfg.screen_points
        screen_params = params._replace(
            max_iterations=jnp.asarray(ecfg.screen_iterations, jnp.int32))
        res_s = jax.vmap(lambda s: icp(
            s[:sp_n], sm[:sp_n], tp, tm, screen_params,
            precision=ecfg.screen_precision))(rotated)
        # full converge (the oracle ranking)
        res_f = jax.vmap(
            lambda s: icp(s, sm, tp, tm, params, precision="high"))(rotated)
        return coarse, r_cand, sim0, res_s, res_f

    for name, src, tgt, gt in category_corpus():
        if name not in want:
            continue
        sp_, sm_ = pad(src)
        tp_, tm_ = pad(tgt)
        pn = np.int32(cfg.resample_count(int(sm_.sum()), int(tm_.sum())))
        (rs, rsm), (rt, rtm) = resample_pairs(
            sp_[None], sm_[None], tp_[None], tm_[None], jnp.asarray([pn]), cfg)
        coarse, r_cand, sim0, res_s, res_f = screen_and_full(
            rs[0], rsm[0], rt[0], rtm[0])
        cm = np.asarray(coarse.candidate_mask)
        fs = np.where(cm, np.asarray(res_s.fitness), 1e30)
        ff = np.where(cm, np.asarray(res_f.fitness), 1e30)
        screen_rank = np.empty_like(np.argsort(fs))
        screen_rank[np.argsort(fs)] = np.arange(fs.size)
        print(f"=== {name} (K={int(cm.sum())}, refine_candidates="
              f"{ecfg.refine_candidates}) ===")
        print(f"{'k':>3s} {'full_fit':>10s} {'pose':>8s} {'screen_fit':>11s} "
              f"{'screen_rank':>11s}")
        for k in np.argsort(ff)[:6]:
            icp_sim = S.from_rigid(np.asarray(res_f.rotation)[k],
                                   np.asarray(res_f.translation)[k])
            cand_sim = S.from_rigid(r_cand[k], jnp.zeros((3,), jnp.float32))
            total = compose(icp_sim, compose(cand_sim, sim0))
            al = np.asarray(apply_similarity(
                total, jnp.asarray(src, jnp.float32)))
            pose = transform_rmse(al, src, gt)
            mark = " <-- DROPPED" if screen_rank[k] >= ecfg.refine_candidates \
                else ""
            print(f"{k:3d} {ff[k]:10.3e} {pose:8.4f} {fs[k]:11.3e} "
                  f"{screen_rank[k]:11d}{mark}")


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.1f}s", file=sys.stderr)
