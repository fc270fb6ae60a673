"""Stage-level TPU profile of the CURRENT bench config (scratch, not shipped)."""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ksstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from kss_icp_tpu.config import KSSICPConfig
from kss_icp_tpu.core.preshape import middle_align
from kss_icp_tpu.core.transforms import apply_similarity, euler_xyz_matrix
from kss_icp_tpu.models.coarse import coarse_align
from kss_icp_tpu.models.icp import ICPParams, icp
from kss_icp_tpu.models.kss_icp import register_resampled, resample_pairs
from kss_icp_tpu.io.formats import load_points

DATA_ROOT = Path("/root/reference/PS_AIS_Simplification/data")
FULL_PAD = 8192
cfg = KSSICPConfig(max_candidates=6, coarse_points=512, coarse_target_points=512, refine_candidates=2)

print("device:", jax.devices()[0].device_kind, flush=True)


def pad(pts):
    out = np.zeros((FULL_PAD, 3), np.float32)
    n = min(len(pts), FULL_PAD)
    out[:n] = pts[:n]
    m = np.zeros((FULL_PAD,), bool)
    m[:n] = True
    return out, m


pairs = []
for subdir in ("registration", "registration_scale"):
    d = DATA_ROOT / subdir
    names = sorted({p.stem for p in d.glob("*.gird")} & {p.stem for p in d.glob("*.wlop")})
    for name in names:
        pairs.append((name, load_points(d / f"{name}.gird"), load_points(d / f"{name}.wlop")))
src = jnp.asarray(np.stack([pad(p[1])[0] for p in pairs]))
sm = jnp.asarray(np.stack([pad(p[1])[1] for p in pairs]))
tgt = jnp.asarray(np.stack([pad(p[2])[0] for p in pairs]))
tm = jnp.asarray(np.stack([pad(p[2])[1] for p in pairs]))
pn = jnp.asarray(np.array(
    [cfg.resample_count(int(m1.sum()), int(m2.sum())) for m1, m2 in zip(np.asarray(sm), np.asarray(tm))],
    np.int32))
B = len(pairs)
print("batch:", B, flush=True)


def t(name, f, *a):
    t0 = time.perf_counter()
    o = f(*a)
    jax.block_until_ready(o)
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(*a)
        jax.block_until_ready(o)
        np.asarray(jax.tree_util.tree_leaves(o)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:9.1f} ms   (compile+1st {c:6.1f} s)", flush=True)
    return o


# 1. resample both clouds (fused 2B-row launch, as in bench)
res_fn = jax.jit(partial(resample_pairs, cfg=cfg))
(rs, rsm), (rt, rtm) = t("resample pairs (2B rows)", res_fn, src, sm, tgt, tm, pn)

# 2. preshape + coarse (with the 512-pt FPS-prefix slice, as in register_resampled)
def pre_coarse(sp_, sm_, tp_, tm_):
    def one(spi, smi, tpi, tmi):
        sim0, _, _ = middle_align(spi, smi, tpi, tmi)
        sal = apply_similarity(sim0, spi)
        ctp = cfg.coarse_target_points or tpi.shape[0]
        co = coarse_align(sal[: cfg.coarse_points], smi[: cfg.coarse_points],
                          tpi[:ctp], tmi[:ctp], steps=cfg.rotation_steps,
                          span=cfg.angle_span, radius=cfg.kernel_radius,
                          max_candidates=cfg.max_candidates,
                          chunk=cfg.rotation_chunk, precision=cfg.coarse_precision,
                          backend=cfg.coarse_backend)
        return sal, sim0, co
    return jax.vmap(one)(sp_, sm_, tp_, tm_)
sal, sim0, co = t("preshape+coarse", jax.jit(pre_coarse), rs, rsm, rt, rtm)

params = ICPParams.from_config(cfg, jnp.float32)

# 3. screen ICP (8 cand x B pairs, sliced screen_points)
def screen(sal_, sm_, tp_, tm_, cand):
    def one(sali, smi, tpi, tmi, ci):
        r_cand = euler_xyz_matrix(ci)
        rotated = jnp.einsum("kij,pj->kpi", r_cand, sali,
                             precision=jax.lax.Precision.HIGHEST)
        sp_n = min(cfg.screen_points, sali.shape[0])
        sp_params = params._replace(
            max_iterations=jnp.asarray(cfg.screen_iterations, jnp.int32))
        f = partial(icp, precision=cfg.screen_precision)
        return jax.vmap(f, in_axes=(0, None, None, None, None))(
            rotated[:, :sp_n], smi[:sp_n], tpi, tmi, sp_params)
    return jax.vmap(one)(sal_, sm_, tp_, tm_, cand)
res1 = t("screen ICP 8cand", jax.jit(screen), sal, rsm, rt, rtm, co.candidate_angles)
print("screen iters used:", np.asarray(res1.iterations).max(), flush=True)

# 4. refine ICP (2 cand x B pairs, warm start)
def refine(sal_, sm_, tp_, tm_, cand, r0, t0_):
    def one(sali, smi, tpi, tmi, ci, r0i, t0i):
        sel = jnp.arange(cfg.refine_candidates)
        r_cand = euler_xyz_matrix(ci[sel])
        rotated = jnp.einsum("kij,pj->kpi", r_cand, sali,
                             precision=jax.lax.Precision.HIGHEST)
        f = partial(icp, precision=cfg.icp_precision)
        return jax.vmap(f, in_axes=(0, None, None, None, None, 0, 0))(
            rotated, smi, tpi, tmi, params, r0i[sel], t0i[sel])
    return jax.vmap(one)(sal_, sm_, tp_, tm_, cand, r0, t0_)
res2 = t("refine ICP 2cand", jax.jit(refine), sal, rsm, rt, rtm,
         co.candidate_angles, res1.rotation, res1.translation)
print("refine iters:", np.asarray(res2.iterations).ravel(), flush=True)

# 5. register_resampled alone
reg_b = jax.jit(jax.vmap(partial(register_resampled, cfg=cfg)))
rr = t("register_resampled", reg_b, rs, rsm, rt, rtm)

# 6. full bench pipeline
@partial(jax.jit, static_argnames=("cfg",))
def pipeline(sp_, sm_, tp_, tm_, pn_, cfg):
    (a, am), (b_, bm) = resample_pairs(sp_, sm_, tp_, tm_, pn_, cfg)
    def one(ai, ami, bi, bmi):
        r = register_resampled(ai, ami, bi, bmi, cfg)
        return r.transform, r.fitness
    return jax.vmap(one)(a, am, b_, bm)
t("FULL pipeline", partial(pipeline, cfg=cfg), src, sm, tgt, tm, pn)
