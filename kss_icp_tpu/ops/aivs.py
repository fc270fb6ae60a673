"""AIVS-style stratified uniform resampling — the TPU re-design of the
reference's `AIVS_Simplification_Pro` (Method_AIVS_SimPro.hpp).

The reference makes FPS tractable on a CPU by localizing it: voxel boxes get
sample quotas proportional to population (round-up at fraction > 0.2,
:776-794), each box runs farthest-point sampling over its own + boundary
points on a local k-d tree under an 8-color OpenMP schedule (:222-376), and
a final "accurate cut" deletes one member of the closest surviving pair
until the count is exact (:848-957). Curvature/edge classes can raise a
box's quota (prate {3,7}, :711-773) — inert in the registration path, where
normals are never computed.

The TPU design keeps the quota idea but runs *all boxes' FPS rounds in
lockstep*: one fori_loop over rounds where round s picks, for every box with
quota > s simultaneously, the box member farthest from the already-picked
set — a segment-argmax over the whole cloud per round. Loop depth is
max-quota-per-box (≈ N/boxes) instead of N, and every round is one wide
masked reduction. The exact-N trim is the same closest-pair deletion rule,
as a fixed-depth masked loop. Plain global FPS (ops/resample.py) is still
the default for registration; this module is the scalable variant for
clouds whose FPS chain depth would otherwise dominate.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kss_icp_tpu.ops.nn import knn, pairwise_sqdist

_BIG = 1e30


def box_quotas(
    counts: jnp.ndarray,
    num_samples,
    class_rates: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-box sample quotas ∝ population, fractional round-up at > 0.2
    (AIVS_BoxSimplification_Points :776-794). `class_rates` optionally
    scales each box's weight (the prate mechanism, :711-773)."""
    w = counts.astype(jnp.float32)
    if class_rates is not None:
        w = w * class_rates.astype(jnp.float32)
    total = jnp.maximum(jnp.sum(w), 1.0)
    ideal = w * (num_samples / total)
    floor = jnp.floor(ideal)
    quota = jnp.where(ideal - floor > 0.2, floor + 1.0, floor).astype(jnp.int32)
    return jnp.minimum(quota, counts)


@partial(jax.jit, static_argnames=("max_rounds",))
def stratified_fps(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    box_id: jnp.ndarray,
    quotas: jnp.ndarray,
    max_rounds: int,
) -> jnp.ndarray:
    """All-boxes-in-lockstep farthest-point sampling.

    Returns a (P,) bool selection mask with exactly min(quota_b, |box_b|)
    picks per box. Round s: every box whose quota exceeds s picks its member
    with the largest distance to the box's already-picked set (first pick =
    nearest the box's centroid, mirroring the local-Voronoi seed)."""
    p = points.shape[0]
    b = quotas.shape[0]
    dtype = points.dtype
    seg = jnp.where(mask, box_id, b).astype(jnp.int32)  # padding -> dump row

    # Seed score: negative distance to own box centroid.
    w = mask.astype(dtype)
    sums = jax.ops.segment_sum(points * w[:, None], seg, num_segments=b + 1)
    cnts = jax.ops.segment_sum(w, seg, num_segments=b + 1)
    centroid = sums / jnp.maximum(cnts, 1.0)[:, None]
    d2cent = jnp.sum((points - centroid[seg]) ** 2, axis=-1)

    def round_step(s, state):
        selected, min_d2 = state
        # Score: distance to nearest selected point in the same box; first
        # round uses closeness to the centroid.
        score = jnp.where(s == 0, -d2cent, min_d2)
        score = jnp.where(mask & ~selected, score, -_BIG)
        best = jax.ops.segment_max(score, seg, num_segments=b + 1)[:b]
        active = (quotas > s) & (best > -_BIG / 2)
        idx = jnp.arange(p, dtype=jnp.int32)
        is_best = (
            mask
            & ~selected
            & (score >= best[jnp.clip(box_id, 0, b - 1)])
            & active[jnp.clip(box_id, 0, b - 1)]
            & (box_id >= 0)
        )
        # One winner per box: the lowest index among ties.
        first = jax.ops.segment_min(
            jnp.where(is_best, idx, p), seg, num_segments=b + 1
        )[:b]
        pick = is_best & (idx == first[jnp.clip(box_id, 0, b - 1)])
        selected = selected | pick
        # Update each point's distance to its box's selected set.
        picked_pos = jnp.where(
            pick[:, None], points, jnp.full_like(points, _BIG)
        )
        box_pick = jax.ops.segment_min(picked_pos, seg, num_segments=b + 1)[:b]
        has_pick = jnp.any(pick)
        d2new = jnp.sum((points - box_pick[jnp.clip(box_id, 0, b - 1)]) ** 2, axis=-1)
        valid_new = (box_pick[jnp.clip(box_id, 0, b - 1), 0] < _BIG / 2) & mask
        min_d2 = jnp.where(valid_new, jnp.minimum(min_d2, d2new), min_d2)
        del has_pick
        return selected, min_d2

    selected0 = jnp.zeros((p,), bool)
    min_d2_0 = jnp.full((p,), _BIG, dtype)
    selected, _ = jax.lax.fori_loop(0, max_rounds, round_step, (selected0, min_d2_0))
    return selected


@partial(jax.jit, static_argnames=("max_cuts",))
def accurate_cut(
    points: jnp.ndarray,
    selected: jnp.ndarray,
    target,
    max_cuts: int = 64,
) -> jnp.ndarray:
    """Trim a selection to exactly `target` by repeatedly deleting one member
    of the closest selected pair — keeping the member whose second-nearest
    selected neighbour is farther (AIVS_AccurateCut_Optimization :848-957:
    delete the point in the tighter spot)."""
    p = points.shape[0]

    def cut(_, sel):
        count = jnp.sum(sel)

        def do_cut(sel):
            d2 = pairwise_sqdist(points, points)
            valid = sel[:, None] & sel[None, :]
            d2 = jnp.where(valid, d2, _BIG)
            d2 = jnp.where(jnp.eye(p, dtype=bool), _BIG, d2)
            flat = jnp.argmin(d2)
            i, j = flat // p, flat % p
            # Second-nearest selected neighbour of each pair member.
            sec_i = jnp.sort(d2[i])[1]
            sec_j = jnp.sort(d2[j])[1]
            drop = jnp.where(sec_i < sec_j, i, j)
            return sel.at[drop].set(False)

        return jax.lax.cond(count > target, do_cut, lambda s: s, sel)

    return jax.lax.fori_loop(0, max_cuts, cut, selected)


def classify_curvature(
    normals: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 12,
    curved_threshold: float = 0.1,
    edge_threshold: float = 0.3,
) -> jnp.ndarray:
    """Per-point class 0 (flat) / 1 (curved) / 2 (edge) from the mean normal
    deviation over the k-neighborhood — AIVS_NormalValue +
    AIVS_Classification_{Curvature,Edge} (:180-219, :711-773). With no
    normals the registration path leaves every point class 0 (the
    reference's de-facto behaviour, SURVEY.md §2 AIVS row)."""
    _, idx = knn(points, points, mask, k)
    neigh = normals[idx]  # (P, k, 3)
    dev = 1.0 - jnp.abs(jnp.einsum("pki,pi->pk", neigh, normals))
    mean_dev = jnp.mean(dev, axis=1)
    cls = jnp.where(mean_dev > edge_threshold, 2,
                    jnp.where(mean_dev > curved_threshold, 1, 0))
    return jnp.where(mask, cls, 0).astype(jnp.int32)


def class_rate_per_box(
    cls: jnp.ndarray,
    box_id: jnp.ndarray,
    mask: jnp.ndarray,
    num_boxes: int,
    rates=(1.0, 3.0, 7.0),
) -> jnp.ndarray:
    """Mean prate multiplier per box (flat 1x, curved 3x, edge 7x — the
    reference's prate={3,7})."""
    seg = jnp.where(mask, box_id, num_boxes).astype(jnp.int32)
    r = jnp.asarray(rates, jnp.float32)[jnp.clip(cls, 0, 2)]
    w = mask.astype(jnp.float32)
    s = jax.ops.segment_sum(r * w, seg, num_segments=num_boxes + 1)[:num_boxes]
    c = jax.ops.segment_sum(w, seg, num_segments=num_boxes + 1)[:num_boxes]
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 1.0)


def aivs_resample(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    num_samples: int,
    boxes_per_axis: Optional[int] = None,
    normals: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full AIVS pipeline: grid → (classified) quotas → lockstep per-box FPS
    → exact-N cut. Returns (points, selection_mask) in the input's padded
    shape with exactly min(num_samples, valid) selected."""
    from kss_icp_tpu.ops.spatial import build_voxel_grid, estimate_box_scale

    n_valid = int(jnp.sum(mask))
    nb = boxes_per_axis or estimate_box_scale(n_valid)
    grid = build_voxel_grid(points, mask, nb)

    rates = None
    if normals is not None:
        cls = classify_curvature(normals, points, mask)
        rates = class_rate_per_box(cls, grid.box_id, mask, nb**3)
    quotas = box_quotas(grid.counts, num_samples, rates)

    # Round-up slack: a few extra rounds guarantee every quota is met.
    max_q = int(jnp.max(quotas))
    sel = stratified_fps(points, mask, grid.box_id, quotas, max_rounds=max(max_q, 1))
    target = min(num_samples, n_valid)
    slack = int(jnp.sum(quotas)) - target
    if slack > 0:
        sel = accurate_cut(points, sel, target, max_cuts=_next_pow2(slack))
    return points * sel[:, None].astype(points.dtype), sel


def _next_pow2(x: int) -> int:
    return 1 << max(0, math.ceil(math.log2(max(x, 1))))
