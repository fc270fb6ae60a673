"""Pallas TPU kernel: fused rotation-grid scoring for the coarse search.

The XLA path (models/coarse.score_rotation_field) scores the step^3 Euler
grid as chunked batched matmuls, but XLA materializes each (chunk, P, T)
squared-distance tensor in HBM before the row-min — at the reference's
working size (512 rotations x 2048 x 2048 f32, initRegistrationKSS.hpp:
245-270) that is ~8.6 GB of HBM traffic per cloud pair, which profiling
shows is ~1/3 of the whole pipeline. This kernel fuses
rotate -> pairwise distance -> row-min -> masked mean into one pass: the
full augmented target (T, 4) stays resident in VMEM, each (rotation, query
tile) grid step computes its (TQ, T) relative-distance block on the MXU and
immediately reduces it, so HBM sees only O(C·P) rotated sources and the
(C,) score vector.

Same augmented-coordinate trick as ops/nn_pallas.py: qa = [R·q, 1],
ra = [-2·t, ||t||^2 (BIG if masked)] gives ||R·q - t||^2 - ||q||^2 in one
K=4 MXU contraction; ||q||^2 is rotation-invariant so it is added back from
the *unrotated* source. Scoring semantics match initRegistration_Error_Ave
(mean 1-NN distance over valid source points, initRegistrationKSS.hpp:
430-450) bit-for-bit at precision="highest".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30

# Mosaic's dot lowering supports only DEFAULT (bf16 passes) and HIGHEST
# (full f32); "high" promotes to HIGHEST — exactness at a cost the fused
# kernel can afford.
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _field_kernel(qa_ref, ra_ref, q2_ref, w_ref, out_ref, *, precision):
    # grid = (C, nq): rotation index c outer, query tile i inner. The output
    # block is (8, 128) rows of per-rotation sums indexed by c // 8, so it
    # stays resident across the 8·nq steps that write it; partial sums for
    # rotation c accumulate into row c % 8 across i.
    c = pl.program_id(0)
    i = pl.program_id(1)
    rel = jax.lax.dot_general(
        qa_ref[0],
        ra_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (TQ, T): ||R q - t||^2 - ||q||^2 (+BIG on masked t)
    m = jnp.min(rel, axis=1, keepdims=True)  # (TQ, 1)
    d = jnp.sqrt(jnp.maximum(m + q2_ref[:], 0.0))
    s = jnp.sum(d * w_ref[:])
    row = pl.ds(c % 8, 1)
    s_row = jnp.full((1, 128), s, jnp.float32)

    @pl.when(i == 0)
    def _():
        out_ref[row, :] = s_row

    @pl.when(i > 0)
    def _():
        out_ref[row, :] = out_ref[row, :] + s_row


def _field_kernel_vpu(q_ref, t_ref, out_ref):
    # VPU variant: exact f32 distances via broadcast arithmetic — no MXU,
    # so no K-padding waste and no bf16-pass precision tradeoffs.
    #
    # Layouts are chosen so no operand has a tiny trailing dim (Mosaic
    # re-tiles pallas operands to (8, 128) tiles, so a (..., 3) input would
    # be copied at 128/3 ≈ 42x HBM blowup): q_ref is (1, 8, TQ) rotated-
    # source coordinate ROWS [x; y; z; w(source weight); 0...], t_ref is
    # (T, 8) target COLUMNS [x, y, z, BIG-if-masked, 0...]. The distance
    # block is (T, TQ) and the 1-NN min reduces over the sublane axis.
    c = pl.program_id(0)
    i = pl.program_id(1)
    q = q_ref[0]  # (8, TQ)
    t = t_ref[:]  # (T, 8)
    dx = t[:, 0:1] - q[0:1, :]
    dy = t[:, 1:2] - q[1:2, :]
    dz = t[:, 2:3] - q[2:3, :]
    rel = dx * dx + dy * dy + dz * dz + t[:, 3:4]  # (T, TQ)
    m = jnp.min(rel, axis=0, keepdims=True)  # (1, TQ)
    d = jnp.sqrt(jnp.maximum(m, 0.0))
    s = jnp.sum(d * q[3:4, :])
    row = pl.ds(c % 8, 1)
    s_row = jnp.full((1, 128), s, jnp.float32)

    @pl.when(i == 0)
    def _():
        out_ref[row, :] = s_row

    @pl.when(i > 0)
    def _():
        out_ref[row, :] = out_ref[row, :] + s_row


@functools.partial(
    jax.jit, static_argnames=("tile_q", "precision", "interpret", "method")
)
def rotation_scores_pallas(
    source: jnp.ndarray,
    source_mask: jnp.ndarray,
    target: jnp.ndarray,
    target_mask: jnp.ndarray,
    rotations: jnp.ndarray,
    tile_q: int = 256,
    precision: str = "highest",
    interpret: bool = False,
    method: str = "vpu",
) -> jnp.ndarray:
    """Mean 1-NN distance of R_c·source to target for every rotation.

    source (P, 3), target (T, 3) with masks; rotations (C, 3, 3).
    Returns (C,) f32 scores — the flattened rotation field. vmap over a
    leading batch axis adds a grid dimension (pairs run back-to-back on the
    same core with no HBM blowup).

    method "vpu" computes distances with exact-f32 broadcast arithmetic
    (default — a K=3 contraction wastes the MXU on K-padding); "dot" uses
    the augmented-matmul trick at `precision`.
    """
    f32 = jnp.float32
    src = source.astype(f32)
    tgt = target.astype(f32)
    rots = rotations.astype(f32)
    c_n = rots.shape[0]
    p_n = src.shape[0]
    t_n = tgt.shape[0]
    qp = _round_up(max(p_n, tile_q), tile_q)
    tp = _round_up(max(t_n, 128), 128)

    cp = _round_up(c_n, 8)

    # Rotate once on the MXU (tiny: C·P·9 MACs) and augment with ones.
    rotated = jnp.einsum(
        "cij,pj->cpi", rots, src, precision=jax.lax.Precision.HIGHEST
    )
    qa = jnp.concatenate([rotated, jnp.ones((c_n, p_n, 1), f32)], axis=-1)
    qa = jnp.pad(qa, ((0, cp - c_n), (0, qp - p_n), (0, 0)))

    # ||q||^2 is rotation-invariant: take it from the unrotated source.
    q2 = jnp.sum(src * src, axis=1, keepdims=True)  # (P, 1)
    q2 = jnp.pad(q2, ((0, qp - p_n), (0, 0)))
    w = source_mask.astype(f32)[:, None]
    w = jnp.pad(w, ((0, qp - p_n), (0, 0)))  # padding rows weigh 0

    t2 = jnp.where(target_mask, jnp.sum(tgt * tgt, axis=1), _BIG)
    ra = jnp.concatenate(
        [-2.0 * tgt * target_mask[:, None].astype(f32), t2[:, None]], axis=1
    )
    ra = jnp.pad(ra, ((0, tp - t_n), (0, 0)))
    pad_rows = jnp.arange(tp) >= t_n
    ra = ra.at[:, 3].set(jnp.where(pad_rows, _BIG, ra[:, 3]))

    nq = qp // tile_q
    out_spec = pl.BlockSpec(
        (8, 128), lambda c, i: (c // 8, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((cp, 128), f32)
    w_spec = pl.BlockSpec(
        (tile_q, 1), lambda c, i: (i, 0), memory_space=pltpu.VMEM
    )

    if method == "vpu":
        # Target as (T, 8) columns [x, y, z, BIG-if-masked, 0...]; rotated
        # source as (C, 8, P) coordinate rows with the source weight in row
        # 3 — both layouts keep the trailing dim tile-wide (see kernel doc).
        tm_big = jnp.where(target_mask, 0.0, _BIG)
        tmat = jnp.stack([tgt[:, 0], tgt[:, 1], tgt[:, 2], tm_big], axis=1)
        tmat = jnp.pad(tmat, ((0, tp - t_n), (0, 4)))
        pad_rows_t = (jnp.arange(tp) >= t_n)[:, None]
        col3 = (jnp.arange(8) == 3)[None, :]
        tmat = jnp.where(pad_rows_t & col3, _BIG, tmat)

        wrow = source_mask.astype(f32)
        wrow = jnp.pad(wrow, (0, qp - p_n))  # padding columns weigh 0
        qr = jnp.pad(
            jnp.swapaxes(rotated, 1, 2), ((0, cp - c_n), (0, 0), (0, qp - p_n))
        )  # (C, 3, P)
        qr = jnp.concatenate(
            [
                qr,
                jnp.broadcast_to(wrow[None, None, :], (cp, 1, qp)),
                jnp.zeros((cp, 4, qp), f32),
            ],
            axis=1,
        )  # (C, 8, P)
        sums = pl.pallas_call(
            _field_kernel_vpu,
            grid=(cp, nq),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, tile_q), lambda c, i: (c, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tp, 8), lambda c, i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qr, tmat)
    else:
        sums = pl.pallas_call(
            functools.partial(_field_kernel, precision=_PRECISIONS[precision]),
            grid=(cp, nq),
            in_specs=[
                pl.BlockSpec(
                    (1, tile_q, 4), lambda c, i: (c, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tp, 4), lambda c, i: (0, 0), memory_space=pltpu.VMEM
                ),
                w_spec,
                w_spec,
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qa, ra, q2, w)

    denom = jnp.maximum(jnp.sum(source_mask.astype(f32)), 1.0)
    return sums[:c_n, 0] / denom
