"""Batched pair registration sharded over a device mesh.

The ModelNet40/SHREC sweep axis: B independent (source, target) pairs,
vmapped into one program and sharded along "pairs". No collectives cross
pair boundaries, so weak scaling is communication-free by construction —
the TPU answer to the reference's one-pair-at-a-time Main_KSS_List loop
(Main_KSS_List.cpp:151-179).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kss_icp_tpu.config import DEFAULT_CONFIG, KSSICPConfig
from kss_icp_tpu.models.kss_icp import RegistrationResult, register_resampled


def _vmapped(cfg: KSSICPConfig):
    def one(sp, sm, tp, tm):
        return register_resampled(sp, sm, tp, tm, cfg)

    return jax.vmap(one)


@partial(jax.jit, static_argnames=("cfg", "mesh", "pair_axis"))
def register_batch(
    source_points: jnp.ndarray,   # (B, P, 3)
    source_mask: jnp.ndarray,     # (B, P)
    target_points: jnp.ndarray,   # (B, P, 3)
    target_mask: jnp.ndarray,     # (B, P)
    cfg: KSSICPConfig = DEFAULT_CONFIG,
    mesh: Optional[Mesh] = None,
    pair_axis: str = "pairs",
) -> RegistrationResult:
    """Register B resampled pairs at once.

    With a mesh, inputs are constrained to be sharded along `pair_axis`
    (batch dim split across devices; XLA partitions the whole computation
    with zero cross-pair communication).
    """
    if mesh is not None:
        shard = NamedSharding(mesh, P(pair_axis))
        source_points = jax.lax.with_sharding_constraint(source_points, shard)
        source_mask = jax.lax.with_sharding_constraint(source_mask, shard)
        target_points = jax.lax.with_sharding_constraint(target_points, shard)
        target_mask = jax.lax.with_sharding_constraint(target_mask, shard)
    return _vmapped(cfg)(source_points, source_mask, target_points, target_mask)
