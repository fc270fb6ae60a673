"""Pallas TPU kernel: whole-batch farthest-point sampling in one program.

The XLA FPS (ops/resample.farthest_point_sampling) is a fori_loop of ~2000
tiny steps; on a TPU each step is a separate dispatch of a (B, P) argmax +
distance update, so the stage is latency-bound (~1/3 of pipeline time at
the reference's working size). Here the ENTIRE batch runs lockstep inside
one kernel: coordinates, running min-distances and outputs stay resident in
VMEM for all ~2000 steps, each step is a handful of wide VPU ops over
(B, P) lanes, and the winning point is extracted with a one-hot reduction
instead of a gather (no dynamic addressing on the lane axis).

Pick semantics are identical to the XLA path (same seed = masked point
farthest from the masked centroid, same first-index tie-breaks), so the two
backends return byte-identical index sequences — asserted by
tests/test_resample_pallas.py.

Replaces the same reference machinery as ops/resample.py: AIVS per-box FPS
+ exact-N trim (Method_AIVS_SimPro.hpp:222-376,:848-957).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(x_ref, y_ref, z_ref, w_ref, idx_ref, *, num_samples: int):
    x = x_ref[:]
    y = y_ref[:]
    z = z_ref[:]
    w = w_ref[:]  # (B, P) 1.0 = valid
    b, p = x.shape
    dtype = x.dtype

    # Seed score: squared distance to the masked centroid (invalid: -1).
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    cx = jnp.sum(x * w, axis=1, keepdims=True) / cnt
    cy = jnp.sum(y * w, axis=1, keepdims=True) / cnt
    cz = jnp.sum(z * w, axis=1, keepdims=True) / cnt
    d2c = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
    score0 = jnp.where(w > 0, d2c, -1.0)

    iota = jax.lax.broadcasted_iota(jnp.int32, (b, p), 1)

    def body(s, score):
        # Per-row argmax with first-index tie-break (== jnp.argmax).
        m = jnp.max(score, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(score == m, iota, p), axis=1, keepdims=True)
        # Output is (S, B): the dynamic per-step store offset must be on the
        # sublane dim (lane-dim offsets need static 128-alignment proofs).
        idx_ref[pl.ds(s, 1), :] = sel.T
        # Gather-free coordinate extraction: one-hot masked sums.
        onehot = (iota == sel).astype(dtype)
        px = jnp.sum(x * onehot, axis=1, keepdims=True)
        py = jnp.sum(y * onehot, axis=1, keepdims=True)
        pz = jnp.sum(z * onehot, axis=1, keepdims=True)
        d2 = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        d2m = jnp.where(w > 0, d2, -1.0)
        # Step 0 replaces the seed score outright (the XLA path's init
        # min_d2 is +BIG, so its first min() is just d2m).
        return jnp.where(s == 0, d2m, jnp.minimum(score, d2m))

    jax.lax.fori_loop(0, num_samples, body, score0)


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def fps_batch_pallas(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    num_samples: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched FPS: (B, P, 3) points + (B, P) mask -> (B, S) indices +
    (B, S) sample mask. Matches ops/resample.farthest_point_sampling
    per row, but runs the whole batch in one kernel launch."""
    f32 = jnp.float32
    b_n, p_n = mask.shape
    bp = _round_up(max(b_n, 8), 8)
    pp = _round_up(max(p_n, 128), 128)
    sp = _round_up(max(num_samples, 128), 128)

    pts = points.astype(f32)

    def prep(coord):
        c = jnp.pad(coord, ((0, bp - b_n), (0, pp - p_n)))
        return c

    x = prep(pts[:, :, 0])
    y = prep(pts[:, :, 1])
    z = prep(pts[:, :, 2])
    w = jnp.pad(mask.astype(f32), ((0, bp - b_n), (0, pp - p_n)))

    idx = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples=num_samples),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((bp, pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (sp, bp), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((sp, bp), jnp.int32),
        interpret=interpret,
    )(x, y, z, w)

    idx = jnp.clip(idx[:num_samples, :b_n].T, 0, p_n - 1)
    count = jnp.sum(mask, axis=1)
    smask = jnp.arange(num_samples)[None, :] < jnp.minimum(
        count, num_samples
    )[:, None]
    return idx, smask
