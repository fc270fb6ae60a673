"""Pallas TPU kernel for tiled 1-nearest-neighbor.

This is the framework's hot op (SURVEY.md §3.2): rotation-grid scoring, ICP
correspondence and the PCR_QM metric are all 1-NN queries — the reference
routes every one through PCL FLANN k-d trees (initRegistrationKSS.hpp:
224-236, registrationMeasure.hpp:47-98). The XLA einsum path (ops/nn.py)
materializes or chunks a (Q, R) distance matrix through HBM; this kernel
streams reference tiles through VMEM and keeps a running (min, argmin) per
query row, so HBM traffic is O(Q + R) instead of O(Q·R) — the right shape
for full-resolution metric queries (10⁵×10⁵ would be a 40 GB matrix).

Trick: with augmented coordinates
    qa = [q, 1]            (Q, 4)
    ra = [−2·r, ‖r‖²]      (R, 4)   (masked rows: [0, 0, 0, BIG])
one MXU matmul qa @ raᵀ yields ‖q−r‖² − ‖q‖² per tile — enough for the
argmin; ‖q‖² is added back outside. The mask rides in the augmented column,
so invalid reference rows lose every comparison without a separate mask
operand. K = 4 keeps the contraction a single well-formed MXU pass.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nn_kernel(qa_ref, ra_ref, d2_ref, idx_ref, *, tile_r: int):
    # Outputs are whole (nq, TQ) arrays resident in VMEM for the whole grid
    # (tiny: nq·TQ ≤ a few KB per 64k queries); row i is this q-tile's slot.
    i = pl.program_id(0)
    j = pl.program_id(1)
    rel = jax.lax.dot_general(
        qa_ref[:],
        ra_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 MXU contractions default to bf16 passes; that noise corrupts
        # the running argmin (same finding as ops/nn.pairwise_sqdist).
        precision=jax.lax.Precision.HIGHEST,
    )  # (TQ, TR): ||q-r||^2 - ||q||^2 (+BIG on masked r)
    tile_min = jnp.min(rel, axis=1)
    tile_arg = jnp.argmin(rel, axis=1).astype(jnp.int32) + j * tile_r

    @pl.when(j == 0)
    def _():
        d2_ref[i, :] = tile_min
        idx_ref[i, :] = tile_arg

    @pl.when(j > 0)
    def _():
        cur = d2_ref[i, :]
        better = tile_min < cur
        d2_ref[i, :] = jnp.where(better, tile_min, cur)
        idx_ref[i, :] = jnp.where(better, tile_arg, idx_ref[i, :])


def _nn_vpu_kernel(q_ref, t_ref, d2_ref, idx_ref):
    # Exact-f32 distances via VPU broadcast arithmetic (no MXU, so no
    # K-padding waste and no bf16-pass noise in the argmin). t_ref is the
    # whole reference as (8, R) rows [x, y, z, BIG-if-masked, 0...],
    # resident in VMEM for the entire grid.
    i = pl.program_id(0)
    q = q_ref[:]  # (TQ, 3)
    dx = q[:, 0:1] - t_ref[0:1, :]
    dy = q[:, 1:2] - t_ref[1:2, :]
    dz = q[:, 2:3] - t_ref[2:3, :]
    rel = dx * dx + dy * dy + dz * dz + t_ref[3:4, :]  # (TQ, R)
    m = jnp.min(rel, axis=1, keepdims=True)
    r = rel.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, rel.shape, 1)
    amin = jnp.min(jnp.where(rel == m, lane, r), axis=1)
    d2_ref[i, :] = m[:, 0]
    idx_ref[i, :] = amin.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_q", "interpret"))
def nearest_neighbor_vpu(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    tile_q: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-f32 1-NN: (sq_distances (Q,), indices (Q,)) — same contract as
    nearest_neighbor / nearest_neighbor_pallas, different compute strategy:
    the whole reference stays VMEM-resident as broadcastable coordinate rows
    and each (TQ, R) distance block is pure VPU arithmetic. Preferred inside
    the ICP loop at working sizes (R ≤ ~8k): no (Q, R) HBM tensor and the
    argmin is exact without HIGHEST's 6 MXU passes. First-index tie-breaks
    match jnp.argmin."""
    q_n = query.shape[0]
    r_n = ref.shape[0]
    qp = _round_up(max(q_n, tile_q), tile_q)
    rp = _round_up(max(r_n, 128), 128)
    f32 = jnp.float32

    q = jnp.pad(query.astype(f32), ((0, qp - q_n), (0, 0)))
    r = ref.astype(f32)
    big = jnp.where(ref_mask, 0.0, _BIG)
    tmat = jnp.stack([r[:, 0], r[:, 1], r[:, 2], big], axis=0)  # (4, R)
    tmat = jnp.pad(tmat, ((0, 4), (0, rp - r_n)))
    pad_cols = (jnp.arange(rp) >= r_n)[None, :]
    row3 = (jnp.arange(8) == 3)[:, None]
    tmat = jnp.where(row3 & pad_cols, _BIG, tmat)

    nq = qp // tile_q
    d2, idx = pl.pallas_call(
        _nn_vpu_kernel,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nq, tile_q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, tile_q), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, tile_q), f32),
            jax.ShapeDtypeStruct((nq, tile_q), jnp.int32),
        ],
        interpret=interpret,
    )(q, tmat)

    d2 = d2.reshape(qp)[:q_n]
    idx = idx.reshape(qp)[:q_n]
    # Fully-masked reference: keep the XLA path's +BIG scores; clamp the
    # padded-lane sentinel index into range.
    d2 = jnp.where(d2 >= _BIG / 2, _BIG, jnp.maximum(d2, 0.0))
    return d2, jnp.clip(idx, 0, max(r_n - 1, 0))


@functools.partial(
    jax.jit, static_argnames=("tile_q", "tile_r", "interpret")
)
def nearest_neighbor_pallas(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    tile_q: int = 256,
    tile_r: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN of (Q, 3) queries among valid (R, 3) reference points.

    Returns (sq_distances (Q,), indices (Q,)) — the contract of
    ops.nn.nearest_neighbor. Shapes are padded internally to tile multiples;
    `interpret=True` runs the kernel in the Pallas interpreter (CPU tests).
    """
    q_n = query.shape[0]
    r_n = ref.shape[0]
    qp = _round_up(max(q_n, tile_q), tile_q)
    rp = _round_up(max(r_n, tile_r), tile_r)
    f32 = jnp.float32

    q = query.astype(f32)
    r = ref.astype(f32)
    q2 = jnp.sum(q * q, axis=1)  # (Q,)

    qa = jnp.concatenate([q, jnp.ones((q_n, 1), f32)], axis=1)
    qa = jnp.pad(qa, ((0, qp - q_n), (0, 0)))
    r2 = jnp.where(ref_mask, jnp.sum(r * r, axis=1), _BIG)
    ra = jnp.concatenate(
        [-2.0 * r * ref_mask[:, None].astype(f32), r2[:, None]], axis=1
    )
    ra = jnp.pad(ra, ((0, rp - r_n), (0, 0)), constant_values=0.0)
    # Padding rows must never win: give them the BIG augmented column too.
    pad_rows = jnp.arange(rp) >= r_n
    ra = ra.at[:, 3].set(jnp.where(pad_rows, _BIG, ra[:, 3]))

    nq, nr = qp // tile_q, rp // tile_r
    rel_min, idx = pl.pallas_call(
        functools.partial(_nn_kernel, tile_r=tile_r),
        grid=(nq, nr),
        in_specs=[
            pl.BlockSpec((tile_q, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nq, tile_q), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, tile_q), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, tile_q), f32),
            jax.ShapeDtypeStruct((nq, tile_q), jnp.int32),
        ],
        interpret=interpret,
    )(qa, ra)

    rel_min = rel_min.reshape(qp)[:q_n]
    idx = idx.reshape(qp)[:q_n]
    d2 = jnp.maximum(rel_min + q2, 0.0)
    # Fully-masked reference: mirror the XLA path's +BIG scores.
    d2 = jnp.where(rel_min >= _BIG / 2, _BIG, d2)
    return d2, jnp.clip(idx, 0, max(r_n - 1, 0))
