"""Brute-force masked nearest-neighbor ops — the TPU replacement for every
k-d tree in the reference.

The reference funnels all spatial queries through PCL FLANN k-d trees
(initRegistrationKSS.hpp:224-236 rotation scoring, registrationMeasure.hpp
metrics, ICP correspondence inside PCL). Tree traversal is a scalar,
branchy, pointer-chasing workload — the worst case for a TPU. At the
reference's working sizes (≤2000 points per cloud, ≤~10^5 full-res) a dense
pairwise-distance matmul on the MXU wins by orders of magnitude:
|Q|x|R| sq-distances = one rank-3 matmul + row reductions, fully fused by XLA.

All ops are mask-correct: invalid reference rows score +inf, invalid query
rows are excluded from reductions.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = 1e30


def pairwise_sqdist(
    a: jnp.ndarray,
    b: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Squared Euclidean distances between (..., Q, 3) and (..., R, 3).

    Uses ||a||^2 + ||b||^2 - 2 a·b so the inner term is an MXU matmul.
    Clamped at zero (the expansion can go slightly negative in f32).

    precision defaults to HIGHEST and that default is load-bearing wherever
    exact correspondences matter: TPU default matmul precision runs f32
    contractions as bf16 passes, whose noise biases the row-min DOWN (min of
    noisy values) — measured 40% MAE error on bundled pairs. The K=3
    contraction pads to a full 128-lane MXU pass though, so HIGHEST's 6
    passes dominate rotation-grid scoring; callers that only need *rankings*
    (coarse search) may lower it (see KSSICPConfig.coarse_precision).
    """
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    ab = jnp.einsum("...qi,...ri->...qr", a, b, precision=precision)
    d2 = a2[..., :, None] + b2[..., None, :] - 2.0 * ab
    return jnp.maximum(d2, 0.0)


def nearest_neighbor(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    *,
    chunk: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN of each query point among valid reference points.

    Returns (sq_distances (..., Q), indices (..., Q)). Invalid reference
    points never win (they score +inf). `chunk` splits the query axis to
    bound the (Q, R) intermediate; with chunking the matmul+min fuse per
    chunk so HBM never sees the full matrix. Keep `precision` at HIGHEST
    wherever the argmin must be exact (see pairwise_sqdist).
    """
    if chunk is None or query.shape[-2] <= chunk:
        return _nn_once(query, ref, ref_mask, precision)

    q = query.shape[-2]
    if q % chunk != 0:
        # Static-shape world: caller pads; fall back to one shot otherwise.
        return _nn_once(query, ref, ref_mask, precision)

    def body(qc):
        return _nn_once(qc, ref, ref_mask, precision)

    qs = query.reshape(query.shape[:-2] + (q // chunk, chunk, 3))
    d2, idx = jax.lax.map(body, jnp.moveaxis(qs, -3, 0))
    d2 = jnp.moveaxis(d2, 0, -2).reshape(query.shape[:-2] + (q,))
    idx = jnp.moveaxis(idx, 0, -2).reshape(query.shape[:-2] + (q,))
    return d2, idx


def _nn_once(query, ref, ref_mask, precision=jax.lax.Precision.HIGHEST):
    d2 = pairwise_sqdist(query, ref, precision=precision)
    d2 = jnp.where(ref_mask[..., None, :], d2, _BIG)
    return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1)


def masked_mean_nn_distance(
    query: jnp.ndarray,
    query_mask: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Mean 1-NN *distance* (not squared) over valid query points.

    This is the rotation-grid alignment error `initRegistration_Error_Ave`
    (initRegistrationKSS.hpp:430-450). Only the min enters the mean (no
    argmin), so a reduced `precision` trades per-point noise that largely
    averages out against a 2-6x faster MXU pass.
    """
    d2 = pairwise_sqdist(query, ref, precision=precision)
    d2 = jnp.where(ref_mask[..., None, :], d2, _BIG)
    d = jnp.sqrt(jnp.min(d2, axis=-1))
    w = query_mask.astype(d.dtype)
    return jnp.sum(d * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)


def trimmed_masked_mean(
    values: jnp.ndarray,
    mask: jnp.ndarray,
    trim_fraction: float,
) -> jnp.ndarray:
    """Mean of the smallest ceil(q * n_valid) valid values along the last
    axis (invalid entries never participate). The robust-statistics core of
    the overlap mode: on partially-overlapping clouds the largest NN
    distances come from the non-overlap region and carry no alignment
    signal — trimming them makes the score measure only the overlap."""
    dtype = values.dtype
    vm = jnp.where(mask, values, _BIG)
    vs = jnp.sort(vm, axis=-1)                       # ascending, invalid last
    nvalid = jnp.sum(mask.astype(jnp.int32), axis=-1)
    k = jnp.clip(_trim_count(nvalid, trim_fraction),
                 1, jnp.maximum(nvalid, 1))
    csum = jnp.cumsum(vs, axis=-1)
    picked = jnp.take_along_axis(csum, (k - 1)[..., None], axis=-1)[..., 0]
    return picked / k.astype(dtype)


def _trim_count(nvalid: jnp.ndarray, q: float) -> jnp.ndarray:
    """ceil(q * nvalid) computed stably: an f32 product at an exact-integer
    value can round to either side (0.7 * 1000 -> 699.99994), so a plain
    cast-truncation drops one element versus the documented rank on some
    platforms/dtypes (ADVICE r4). The 1e-3 guard absorbs f32 rounding at any
    realistic nvalid (error ~ nvalid * 1.2e-7 < 1e-3 for nvalid < 8192)
    while leaving genuine fractional products on their ceil."""
    return jnp.ceil(q * nvalid.astype(jnp.float32) - 1e-3).astype(jnp.int32)


def masked_quantile_threshold(
    values: jnp.ndarray,
    mask: jnp.ndarray,
    q: float,
) -> jnp.ndarray:
    """The q-quantile of the VALID values along the last axis (the value at
    rank ceil(q * n_valid) of the ascending sort) — the per-iteration
    correspondence gate of the trimmed ICP and the inlier-mask cut of the
    overlap iterations."""
    vm = jnp.where(mask, values, _BIG)
    vs = jnp.sort(vm, axis=-1)
    nvalid = jnp.sum(mask.astype(jnp.int32), axis=-1)
    k = jnp.clip(_trim_count(nvalid, q), 1, jnp.maximum(nvalid, 1))
    return jnp.take_along_axis(vs, (k - 1)[..., None], axis=-1)[..., 0]


def masked_nn_error(
    query: jnp.ndarray,
    query_mask: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    metric: str = "ave",
    precision=jax.lax.Precision.HIGHEST,
    trim_fraction: float = 0.7,
) -> jnp.ndarray:
    """Rotation-grid alignment error in the reference's three flavors
    (initRegistrationKSS.hpp) plus the overlap-robust fourth:
      - "ave":  mean 1-NN distance        (initRegistration_Error_Ave :430-450)
      - "max":  max 1-NN SQUARED distance (initRegistration_Error :406-428 —
                the reference never takes the sqrt there, reproduced)
      - "diff": max 1-NN distance − mean  (initRegistration_Error_Diff :452-479)
      - "trim": mean of the best trim_fraction-quantile of 1-NN distances —
                no reference analogue; scores only the overlap region so
                partially-overlapping scans rank the TRUE basin first (the
                reference's identically-normalized pipeline shares the
                partial-scan failure this fixes; see challenge.partial_corpus)
    """
    if metric == "ave":
        return masked_mean_nn_distance(
            query, query_mask, ref, ref_mask, precision=precision
        )
    d2 = pairwise_sqdist(query, ref, precision=precision)
    d2 = jnp.where(ref_mask[..., None, :], d2, _BIG)
    min_d2 = jnp.min(d2, axis=-1)
    if metric == "max":
        return jnp.max(jnp.where(query_mask, min_d2, -_BIG), axis=-1)
    if metric == "diff":
        d = jnp.sqrt(min_d2)
        w = query_mask.astype(d.dtype)
        mean = jnp.sum(d * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)
        return jnp.max(jnp.where(query_mask, d, -_BIG), axis=-1) - mean
    if metric == "trim":
        d = jnp.sqrt(min_d2)
        qm = jnp.broadcast_to(query_mask, d.shape)
        return trimmed_masked_mean(d, qm, trim_fraction)
    raise ValueError(f"unknown error metric {metric!r}")


def masked_mean_nn_sqdist(
    query: jnp.ndarray,
    query_mask: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Mean squared 1-NN distance — PCL's getFitnessScore contract, used for
    the ICP fitness probe (KSS_ICP.hpp:93,:104,:130)."""
    d2, _ = nearest_neighbor(query, ref, ref_mask)
    w = query_mask.astype(d2.dtype)
    return jnp.sum(d2 * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)


# Dense (Q, R) matrices beyond this many elements auto-route to the
# streaming path: 2^25 f32 = 128 MB — comfortably HBM/host-RAM resident,
# while 10^5+-point scans (the reference's Room/block regime,
# Method_Octree.hpp:16) would need 40+ GB dense.
_DENSE_KNN_LIMIT = 1 << 25


@partial(jax.jit, static_argnames=("k", "query_chunk", "ref_chunk"))
def knn(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    k: int,
    query_chunk: int | None = None,
    ref_chunk: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN sq-distances and indices (ascending). Replaces the reference's
    12-NN radius estimation (ballRegionCompute.hpp:477-530) and 20-NN normal
    neighborhoods (normalCompute.hpp:324-336).

    Small problems use one dense masked matmul + top_k. When the (Q, R)
    matrix would exceed ~128 MB — the full-resolution-scan regime the
    reference handles with its octree (ballRegionCompute.hpp:477-530,
    Method_Octree.hpp:16) — the computation streams: query chunks x
    reference tiles with a running top-k merge, so peak memory is
    O(query_chunk * ref_chunk) regardless of cloud size. Explicit
    query_chunk/ref_chunk force the streaming path."""
    q, r = query.shape[-2], ref.shape[-2]
    if (
        query_chunk is None
        and ref_chunk is None
        and q * r <= _DENSE_KNN_LIMIT
    ):
        d2 = pairwise_sqdist(query, ref)
        d2 = jnp.where(ref_mask[..., None, :], d2, _BIG)
        neg_d2, idx = jax.lax.top_k(-d2, k)
        return -neg_d2, idx
    return knn_streaming(
        query, ref, ref_mask, k,
        query_chunk=query_chunk or 2048,
        ref_chunk=ref_chunk or 16384,
    )


@partial(jax.jit, static_argnames=("k", "query_chunk", "ref_chunk"))
def knn_streaming(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    k: int,
    query_chunk: int = 2048,
    ref_chunk: int = 16384,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming k-NN: identical results to the dense path, O(qc * rc) peak
    memory. lax.map over query chunks; inside, lax.scan over reference tiles
    keeps a running (qc, k) best set merged by top_k over the concatenated
    candidates (the k>1 generalization of the Pallas running-min 1-NN,
    ops/nn_pallas.py). Single-cloud layout (Q, 3)/(R, 3) — vmap for batches.
    """
    if query.ndim != 2:
        raise ValueError("knn_streaming expects unbatched (Q, 3) queries; vmap it")
    q, r = query.shape[0], ref.shape[0]
    dtype = query.dtype

    qc = min(query_chunk, q)
    rc = min(ref_chunk, r)
    k_eff = min(k, r)

    # Pad both axes to chunk multiples (padding never wins: masked to +inf).
    q_pad = (-q) % qc
    r_pad = (-r) % rc
    qp = jnp.pad(query, ((0, q_pad), (0, 0)))
    rp = jnp.pad(ref, ((0, r_pad), (0, 0)))
    rm = jnp.pad(ref_mask, (0, r_pad))

    n_tiles = (r + r_pad) // rc
    tiles_pts = rp.reshape(n_tiles, rc, 3)
    tiles_mask = rm.reshape(n_tiles, rc)
    tile_off = jnp.arange(n_tiles, dtype=jnp.int32) * rc

    kk = min(k_eff, rc)

    def per_query_chunk(qblock):
        def tile_step(carry, tile):
            best_d2, best_idx = carry
            pts, msk, off = tile
            d2 = pairwise_sqdist(qblock, pts)
            d2 = jnp.where(msk[None, :], d2, _BIG)
            nd2, nidx = jax.lax.top_k(-d2, kk)
            cat_d2 = jnp.concatenate([best_d2, -nd2], axis=-1)
            cat_ix = jnp.concatenate(
                [best_idx, (nidx + off).astype(jnp.int32)], axis=-1
            )
            md2, sel = jax.lax.top_k(-cat_d2, k_eff)
            mix = jnp.take_along_axis(cat_ix, sel, axis=-1)
            return (-md2, mix), None

        init = (
            jnp.full((qblock.shape[0], k_eff), _BIG, dtype),
            jnp.zeros((qblock.shape[0], k_eff), jnp.int32),
        )
        (d2, idx), _ = jax.lax.scan(
            tile_step, init, (tiles_pts, tiles_mask, tile_off)
        )
        return d2, idx

    qblocks = qp.reshape((q + q_pad) // qc, qc, 3)
    d2, idx = jax.lax.map(per_query_chunk, qblocks)
    d2 = d2.reshape(-1, k_eff)[:q]
    idx = idx.reshape(-1, k_eff)[:q]
    if k_eff < k:  # degenerate tiny-reference case: pad out to k columns
        d2 = jnp.pad(d2, ((0, 0), (0, k - k_eff)), constant_values=_BIG)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return d2, idx
