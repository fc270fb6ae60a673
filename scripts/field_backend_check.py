"""Does the Pallas/HIGH coarse field's candidate list (the shipping
escalation tier) contain the true basin that the XLA/HIGHEST field finds
for rev/1 and box/2? (round-4 follow-up; screen ranking was exonerated)"""

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
    want = set(sys.argv[1:]) or {"rev/1", "box/2"}

    from bench import bench_config
    from kss_icp_tpu.challenge import category_corpus
    from kss_icp_tpu.core.transforms import apply_similarity
    from kss_icp_tpu.core.preshape import middle_align
    from kss_icp_tpu.models.coarse import coarse_align
    from kss_icp_tpu.models.kss_icp import resample_pairs, register_resampled

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

    import functools

    @functools.partial(jax.jit, static_argnames=("backend", "precision"))
    def coarse_of(sp, sm, tp, tm, backend, precision):
        sim0, _, _ = middle_align(sp, sm, tp, tm)
        src_al = apply_similarity(sim0, sp)
        return coarse_align(
            src_al, sm, tp, tm,
            steps=ecfg.rotation_steps, span=ecfg.angle_span,
            radius=ecfg.kernel_radius, max_candidates=ecfg.max_candidates,
            chunk=ecfg.rotation_chunk, precision=precision, backend=backend,
            method=ecfg.coarse_method,
        )

    for name, src, tgt, gt in category_corpus():
        if name not in want:
            continue
        sp_, sm_ = pad(src)
        tp_, tm_ = pad(tgt)
        pn = np.int32(cfg.resample_count(int(sm_.sum()), int(tm_.sum())))
        (rs, rsm), (rt, rtm) = resample_pairs(
            sp_[None], sm_[None], tp_[None], tm_[None], jnp.asarray([pn]), cfg)
        a = (rs[0], rsm[0], rt[0], rtm[0])
        variants = [("xla/highest", "xla", "highest"),
                    ("xla/high", "xla", "high")]
        if jax.default_backend() == "tpu":
            variants.append(("pallas/high (shipping)", "pallas", "high"))
            variants.append(("pallas/highest", "pallas", "highest"))
        print(f"=== {name} ===")
        for label, be, pr in variants:
            c = coarse_of(*a, be, pr)
            ang = np.asarray(c.candidate_angles)
            msk = np.asarray(c.candidate_mask)
            err = np.asarray(c.candidate_errors)
            print(f"  [{label}] candidates={int(msk.sum())}")
            for i in range(min(6, int(msk.sum()))):
                print(f"    {i}: angles=({ang[i][0]:.3f},{ang[i][1]:.3f},"
                      f"{ang[i][2]:.3f}) err={err[i]:.5f}")
        # And what the SHIPPING register (ecfg) picks:
        res = register_resampled(*a, ecfg)
        print(f"  shipping ecfg: chosen={int(res.chosen_candidate)} "
              f"fitness={float(res.fitness):.3e} "
              f"angles={np.asarray(res.coarse.candidate_angles)[int(res.chosen_candidate)]}")


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.1f}s", file=sys.stderr)
