import sys, time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ksstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from functools import partial
from pathlib import Path
from kss_icp_tpu.config import KSSICPConfig
from kss_icp_tpu.core.transforms import apply_similarity
from kss_icp_tpu.metrics import registration_measure_padded
from kss_icp_tpu.models.kss_icp import register_resampled, resample_for_registration
from kss_icp_tpu.io.formats import load_points

prec = sys.argv[1]
DATA = Path("/root/reference/PS_AIS_Simplification/data/registration")
MODELS = ["Bunny","Cat","Dog","Girl","Horse","ant","hand","woodMan","Angel","Armadillo"]
FULL=8192
def pad(p):
    p = p[:FULL]
    out=np.zeros((FULL,3),np.float32); out[:len(p)]=p
    m=np.zeros((FULL,),bool); m[:len(p)]=True
    return out,m
srcs=[pad(load_points(DATA/f"{n}.gird")) for n in MODELS]
tgts=[pad(load_points(DATA/f"{n}.wlop")) for n in MODELS]
S=jnp.asarray(np.stack([x[0] for x in srcs])); SM=jnp.asarray(np.stack([x[1] for x in srcs]))
T=jnp.asarray(np.stack([x[0] for x in tgts])); TM=jnp.asarray(np.stack([x[1] for x in tgts]))
pn=jnp.asarray([min(int(sm.sum()),int(tm.sum()))//2 for sm,tm in zip(np.asarray(SM),np.asarray(TM))])

cfg = KSSICPConfig(max_candidates=16, icp_precision=prec)
rs = jax.jit(jax.vmap(partial(resample_for_registration, cfg=cfg)))
sp,sm = rs(S,SM,pn); tp,tm = rs(T,TM,pn)
reg = jax.jit(jax.vmap(partial(register_resampled, cfg=cfg)))
res = reg(sp,sm,tp,tm); jax.block_until_ready(res.fitness)
ts=[]
for _ in range(3):
    t0=time.perf_counter(); res=reg(sp,sm,tp,tm); jax.block_until_ready(res.fitness); ts.append(time.perf_counter()-t0)
aligned = jax.jit(jax.vmap(apply_similarity))(res.transform, S)
meas = jax.jit(jax.vmap(partial(registration_measure_padded, chunk=None)))(aligned, SM, T, TM)
rmse = np.asarray(meas["rmse"])
print(f"{prec:8s} step={min(ts)*1e3:7.1f}ms rmse={np.round(rmse,5).tolist()}", flush=True)
