"""Per-pair overlap-tier adoption ratios on the partial corpus (TPU) —
data for setting overlap_adopt_margin (round 4)."""

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
    import bench
    from kss_icp_tpu.challenge import partial_corpus, transform_rmse
    from kss_icp_tpu.core.transforms import apply_similarity
    from kss_icp_tpu.escalate import escalate_rerun

    cfg = bench.bench_config()
    ecfg = cfg.escalation_config()
    _progs = bench.make_programs(); pipeline, overlap_prog = _progs[0], _progs[3]
    keep = float(sys.argv[1]) if len(sys.argv) > 1 else 0.92
    pairs = partial_corpus(keep=keep)
    n = len(pairs)
    b = 23

    def pad(pts):
        out = np.zeros((bench.FULL_PAD, 3), np.float32)
        m = np.zeros((bench.FULL_PAD,), bool)
        k = min(len(pts), bench.FULL_PAD)
        out[:k] = pts[:k]
        m[:k] = True
        return out, m

    sp = np.stack([pad(p[1])[0] for p in pairs])
    sm = np.stack([pad(p[1])[1] for p in pairs])
    tp = np.stack([pad(p[2])[0] for p in pairs])
    tm = np.stack([pad(p[2])[1] for p in pairs])
    pn = np.array([cfg.resample_count(int(a.sum()), int(t.sum()))
                   for a, t in zip(sm, tm)], np.int32)

    # bench-style chunked base solve (repetition padded to b)
    total = ((n + b - 1) // b) * b
    idx = np.concatenate([np.arange(n), np.zeros(total - n, np.int64)])
    sl = idx[:b]
    tr_c, packed = pipeline(*map(jnp.asarray,
                                 (sp[sl], sm[sl], tp[sl], tm[sl], pn[sl])), cfg)
    pk = np.asarray(packed)
    tr = jax.tree.map(lambda x: np.asarray(x)[:n], tr_c)
    fit = pk[:n, 0]
    hit = pk[:n, 1] > 0.5

    def resolve(sel):
        o2 = pipeline(*map(jnp.asarray,
                           (sp[sel], sm[sel], tp[sel], tm[sel], pn[sel])), ecfg)
        return o2[0], np.asarray(o2[1])[:, 0]

    tr, fit, _, _ = escalate_rerun(
        resolve, fit, cfg.escalate_threshold, pad_multiple=b, result=tr,
        chunk=b, cap=total, flags=(fit > cfg.escalate_threshold) | hit)

    # overlap rungs: report the comparison per flagged pair
    for ocfg in (cfg.overlap_config(), ecfg.overlap_config()):
        flagged = np.nonzero(fit > cfg.overlap_threshold)[0]
        if flagged.size == 0:
            print("no flagged pairs")
            break
        selp = np.concatenate([flagged, np.repeat(
            flagged[:1], (8 - flagged.size % 8) % 8)])
        print(f"--- rung {ocfg.rotation_steps}^3x{ocfg.overlap_iterations} "
              f"flagged={flagged.size}")
        for c0 in range(0, selp.size, 8):
            cs = selp[c0:c0 + 8]
            tr_sel = jax.tree.map(lambda x: jnp.asarray(x[cs]), tr)
            tot, fstd, tfn, tfo = overlap_prog(
                *map(jnp.asarray, (sp[cs], sm[cs], tp[cs], tm[cs], pn[cs])),
                tr_sel, ocfg)
            tfn, tfo, fstd = map(np.asarray, (tfn, tfo, fstd))
            seen = set()
            for j, gi in enumerate(cs):
                if gi in seen:
                    continue
                seen.add(gi)
                name = pairs[gi][0]
                # pose of incumbent and of overlap solution
                al_i = np.asarray(apply_similarity(
                    jax.tree.map(lambda x, _g=gi: jnp.asarray(x[_g]), tr),
                    jnp.asarray(pairs[gi][1], jnp.float32)))
                al_o = np.asarray(apply_similarity(
                    jax.tree.map(lambda x, _j=j: jnp.asarray(np.asarray(x)[_j]), tot),
                    jnp.asarray(pairs[gi][1], jnp.float32)))
                p_i = transform_rmse(al_i, pairs[gi][1], pairs[gi][3])
                p_o = transform_rmse(al_o, pairs[gi][1], pairs[gi][3])
                ratio = tfn[j] / max(tfo[j], 1e-12)
                adopt = ratio < cfg.overlap_adopt_margin
                print(f"  {name:14s} tf_new={tfn[j]:.3e} tf_old={tfo[j]:.3e} "
                      f"ratio={ratio:.3f} adopt={adopt} pose_inc={p_i:.4f} "
                      f"pose_ovl={p_o:.4f}")
                if adopt:
                    fit[gi] = fstd[j]
                    def put(full, new, _g=gi, _j=j):
                        full[_g] = np.asarray(new)[_j]
                        return full
                    tr = jax.tree.map(put, tr, jax.tree.map(np.asarray, tot))


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.1f}s", file=sys.stderr)
