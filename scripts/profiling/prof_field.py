"""Stage-level TPU profile of the bench pipeline (scratch, not shipped)."""
import time
from functools import partial
from pathlib import Path

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
from kss_icp_tpu.models.kss_icp import register_resampled, resample_for_registration
from kss_icp_tpu.io.formats import load_points

DATA = Path("/root/reference/PS_AIS_Simplification/data/registration")
MODELS = ["Bunny", "Cat", "Dog", "Girl", "Horse", "ant", "hand", "woodMan",
          "Angel", "Armadillo"]
FULL_PAD = 8192
cfg = KSSICPConfig(max_candidates=16)

print("device:", jax.devices()[0].device_kind, flush=True)


def pad(pts):
    out = np.zeros((FULL_PAD, 3), np.float32)
    n = min(len(pts), FULL_PAD)
    out[:n] = pts[:n]
    m = np.zeros((FULL_PAD,), bool)
    m[:n] = True
    return out, m


pairs = [(n, load_points(DATA / f"{n}.gird"), load_points(DATA / f"{n}.wlop"))
         for n in MODELS]
src = jnp.asarray(np.stack([pad(p[1])[0] for p in pairs]))
sm = jnp.asarray(np.stack([pad(p[1])[1] for p in pairs]))
tgt = jnp.asarray(np.stack([pad(p[2])[0] for p in pairs]))
tm = jnp.asarray(np.stack([pad(p[2])[1] for p in pairs]))
pn = jnp.asarray(np.array(
    [cfg.resample_count(int(m1.sum()), int(m2.sum())) for m1, m2 in zip(sm, tm)],
    np.int32))
B = len(pairs)


def t(name, f, *a):
    t0 = time.perf_counter()
    o = f(*a)
    jax.block_until_ready(o)
    # device->host fence (tunnel): pull one leaf
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(*a)
        jax.block_until_ready(o)
        np.asarray(jax.tree_util.tree_leaves(o)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s} {min(ts)*1e3:9.1f} ms   (compile+1st {c:6.1f} s)", flush=True)
    return o


# 1. resample both clouds
resample_b = jax.jit(jax.vmap(partial(resample_for_registration, cfg=cfg),
                              in_axes=(0, 0, 0)))
def both(sp_, sm_, tp_, tm_, pn_):
    a = resample_b(sp_, sm_, pn_)
    b = resample_b(tp_, tm_, pn_)
    return a + b
rs, rsm, rt, rtm = t("resample src+tgt x10", jax.jit(both), src, sm, tgt, tm, pn)

# 2. preshape + coarse
def pre_coarse(sp_, sm_, tp_, tm_):
    def one(spi, smi, tpi, tmi):
        sim0, _, _ = middle_align(spi, smi, tpi, tmi)
        sal = apply_similarity(sim0, spi)
        co = coarse_align(sal, smi, tpi, tmi, steps=cfg.rotation_steps,
                          span=cfg.angle_span, radius=cfg.kernel_radius,
                          max_candidates=cfg.max_candidates,
                          chunk=cfg.rotation_chunk, precision=cfg.coarse_precision)
        return sal, sim0, co
    return jax.vmap(one)(sp_, sm_, tp_, tm_)
sal, sim0, co = t("preshape+coarse x10", jax.jit(pre_coarse), rs, rsm, rt, rtm)

# 3. screen ICP (16 cand x 10 pairs)
params = ICPParams.from_config(cfg, jnp.float32)
def screen(sal_, sm_, tp_, tm_, cand):
    def one(sali, smi, tpi, tmi, ci):
        r_cand = euler_xyz_matrix(ci)
        rotated = jnp.einsum("kij,pj->kpi", r_cand, sali,
                             precision=jax.lax.Precision.HIGHEST)
        p = sali.shape[0]
        screen_mask = smi & (jnp.arange(p) < cfg.screen_points)
        sp_params = params._replace(
            max_iterations=jnp.asarray(cfg.screen_iterations, jnp.int32))
        f = partial(icp, precision=cfg.screen_precision)
        return jax.vmap(f, in_axes=(0, None, None, None, None))(
            rotated, screen_mask, tpi, tmi, sp_params)
    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(sal_, sm_, tp_, tm_, cand)
res1 = t("screen ICP 16cand x10", jax.jit(screen), sal, rsm, rt, rtm,
         co.candidate_angles)

# 4. refine ICP (4 cand x 10 pairs, warm start)
def refine(sal_, sm_, tp_, tm_, cand, r0, t0_):
    def one(sali, smi, tpi, tmi, ci, r0i, t0i):
        sel = jnp.arange(cfg.refine_candidates)
        r_cand = euler_xyz_matrix(ci[sel])
        rotated = jnp.einsum("kij,pj->kpi", r_cand, sali,
                             precision=jax.lax.Precision.HIGHEST)
        f = partial(icp, precision=cfg.icp_precision)
        return jax.vmap(f, in_axes=(0, None, None, None, None, 0, 0))(
            rotated, smi, tpi, tmi, params, r0i[sel], t0i[sel])
    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0))(
        sal_, sm_, tp_, tm_, cand, r0, t0_)
res2 = t("refine ICP 4cand x10", jax.jit(refine), sal, rsm, rt, rtm,
         co.candidate_angles, res1.rotation, res1.translation)
print("refine iters:", np.asarray(res2.iterations), flush=True)

# 5. full register_resampled
reg_b = jax.jit(jax.vmap(partial(register_resampled, cfg=cfg)))
rr = t("register_resampled x10", reg_b, rs, rsm, rt, rtm)

# 6. full pipeline (bench program)
@partial(jax.jit, static_argnames=("cfg",))
def pipeline(sp_, sm_, tp_, tm_, pn_, cfg):
    def one(spi, smi, tpi, tmi, pni):
        a, am = resample_for_registration(spi, smi, pni, cfg)
        b_, bm = resample_for_registration(tpi, tmi, pni, cfg)
        r = register_resampled(a, am, b_, bm, cfg)
        return r.transform, r.fitness
    return jax.vmap(one)(sp_, sm_, tp_, tm_, pn_)
t("FULL pipeline x10", partial(pipeline, cfg=cfg), src, sm, tgt, tm, pn)
