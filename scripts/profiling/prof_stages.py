import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from kss_icp_tpu.config import KSSICPConfig
from kss_icp_tpu.models.kss_icp import resample_for_registration
from kss_icp_tpu.models.coarse import coarse_align
from kss_icp_tpu.models.icp import ICPParams, icp
from kss_icp_tpu.core.preshape import middle_align
from kss_icp_tpu.core.transforms import apply_similarity, euler_xyz_matrix

cfg = KSSICPConfig(max_candidates=16)
rng = np.random.default_rng(0)
B = 10
u = rng.uniform(-1,1,(B, 8192)); v = rng.uniform(-1,1,(B, 8192))
pts = np.stack([u, v, 0.3*np.sin(3*u)*np.cos(2*v)], -1).astype(np.float32)
mask = np.ones((B, 8192), bool)
pn = jnp.full((B,), 2000)

def t(name, f, *a):
    t0=time.perf_counter(); o = f(*a); jax.block_until_ready(o)
    print(f"{name:28s} compile+1st {time.perf_counter()-t0:7.1f} s", flush=True)
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); o=f(*a); jax.block_until_ready(o); ts.append(time.perf_counter()-t0)
    print(f"{name:28s} {min(ts)*1e3:9.1f} ms", flush=True)
    return o

resample_b = jax.jit(jax.vmap(partial(resample_for_registration, cfg=cfg), in_axes=(0,0,0)))
sp, sm = t("fps resample x10", resample_b, jnp.asarray(pts), jnp.asarray(mask), pn)
tp, tm = sp, sm
ang = rng.uniform(0, 2*np.pi, B)
def rz(a):
    c,s=np.cos(a),np.sin(a); return np.array([[c,-s,0],[s,c,0],[0,0,1]],np.float32)
sp2 = jnp.asarray(np.einsum('bij,bpj->bpi', np.stack([rz(a) for a in ang]), np.asarray(sp)))

align_b = jax.jit(jax.vmap(middle_align))
sim0 = align_b(sp2, sm, tp, tm)[0]
src_al = jax.jit(jax.vmap(apply_similarity))(sim0, sp2)
jax.block_until_ready(src_al)

coarse_b = jax.jit(jax.vmap(partial(coarse_align, steps=cfg.rotation_steps, span=cfg.angle_span,
    radius=cfg.kernel_radius, max_candidates=cfg.max_candidates, chunk=cfg.rotation_chunk)))
co = t("coarse 512-rot x10", coarse_b, src_al, sm, tp, tm)

params = ICPParams.from_config(cfg, jnp.float32)
r_cand = jax.jit(jax.vmap(euler_xyz_matrix))(co.candidate_angles)
rotated = jnp.einsum('bkij,bpj->bkpi', r_cand, src_al)
icp_b = jax.jit(jax.vmap(jax.vmap(icp, in_axes=(0,None,None,None,None)), in_axes=(0,0,0,0,None)))
res = t("multistart ICP 16cand x10", icp_b, rotated, sm, tp, tm, params)
print("icp iters:", np.asarray(res.iterations), flush=True)
