"""Point-cloud normal estimation — TPU re-design of normalCompute.hpp.

Reference pipeline (normalCompute.hpp:308-403): PCL NormalEstimationOMP with
k=20 neighbors per point (12 CPU threads), then a serial BFS from point 0
flipping each normal to agree with its parent (:614-742).

TPU design:
  - k-NN neighborhoods via the dense masked distance matmul (ops/nn.knn);
  - per-point 3x3 covariance of the neighborhood, batched closed-form
    smallest-eigenvector extraction (jnp.linalg.eigh on (N, 3, 3) — tiny,
    batched, fully parallel) — no per-point PCA loops;
  - orientation: the reference's BFS is inherently serial pointer-chasing.
    We replace it with synchronous label propagation: seed one point, then
    iterate "orient each point to agree with the weighted majority of its
    already-oriented neighbors" under lax.while_loop until the oriented set
    stops growing. Same connected-component semantics, O(diameter)
    data-parallel steps instead of O(N) serial ones.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from kss_icp_tpu.ops.nn import knn


@partial(jax.jit, static_argnames=("k",))
def estimate_normals(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 20,
) -> jnp.ndarray:
    """Unoriented unit normals via k-NN PCA (smallest covariance eigenvector).

    points (P, 3), mask (P,) -> normals (P, 3); padded rows get [0, 0, 1].
    """
    dtype = points.dtype
    _, idx = knn(points, points, mask, k)  # self included — harmless for PCA
    neigh = points[idx]  # (P, k, 3)
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    centered = neigh - mean
    cov = jnp.einsum(
        "pki,pkj->pij", centered, centered, precision=jax.lax.Precision.HIGHEST
    ) / k
    # eigh ascending: column 0 of eigenvectors = smallest-eigenvalue direction.
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[:, :, 0]
    norms = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / jnp.maximum(norms, jnp.finfo(dtype).tiny)
    default = jnp.zeros_like(normals).at[:, 2].set(1.0)
    return jnp.where(mask[:, None], normals, default)


@partial(jax.jit, static_argnames=("k", "max_rounds"))
def orient_normals(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 8,
    max_rounds: int = 256,
) -> jnp.ndarray:
    """Consistently orient normals by parallel propagation over the k-NN graph.

    Replaces the serial BFS flip (normalCompute.hpp:681-738, 8-NN graph at
    :639). Seed = first valid point. Each round, every unoriented point whose
    neighborhood contains oriented points adopts the sign that agrees with
    the oriented-neighbor average; rounds repeat until the frontier is empty
    (disconnected components keep their PCA sign, as the reference's BFS
    leaves unreachable points untouched).
    """
    p = points.shape[0]
    _, idx = knn(points, points, mask, k)  # (P, k)

    seed = jnp.argmax(mask).astype(jnp.int32)
    oriented0 = jnp.zeros((p,), bool).at[seed].set(True)

    def cond(state):
        oriented, _, changed, rounds = state
        return jnp.logical_and(changed, rounds < max_rounds)

    def body(state):
        oriented, nrm, _, rounds = state
        neigh_oriented = oriented[idx]  # (P, k)
        neigh_n = nrm[idx] * neigh_oriented[..., None].astype(nrm.dtype)
        ref = jnp.sum(neigh_n, axis=1)  # oriented-neighbor direction sum
        has_ref = jnp.any(neigh_oriented, axis=1) & mask & ~oriented
        dot = jnp.sum(ref * nrm, axis=-1)
        flip = has_ref & (dot < 0)
        nrm = jnp.where(flip[:, None], -nrm, nrm)
        new_oriented = oriented | has_ref
        changed = jnp.any(new_oriented != oriented)
        return new_oriented, nrm, changed, rounds + 1

    _, out, _, _ = jax.lax.while_loop(
        cond, body, (oriented0, normals, jnp.asarray(True), jnp.asarray(0))
    )
    return out


def estimate_oriented_normals(
    points: jnp.ndarray, mask: jnp.ndarray, k: int = 20, k_orient: int = 8
) -> jnp.ndarray:
    """estimateNormal_PCL_MP + RegularNormal equivalent in one call."""
    n = estimate_normals(points, mask, k)
    return orient_normals(points, n, mask, k_orient)


# ---------------------------------------------------------------------------
# Mesh-based normals (normalCompute.hpp:34-306) and normal-error metrics
# (:439-564) — evaluation-path capabilities, batched instead of per-face loops.
# ---------------------------------------------------------------------------

def facet_normals(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Unit face normals (F, 3) from a triangle mesh (glmFacetNormals role)."""
    vertices = jnp.asarray(vertices)
    faces = jnp.asarray(faces)
    a = vertices[faces[:, 0]]
    cross = jnp.cross(vertices[faces[:, 1]] - a, vertices[faces[:, 2]] - a)
    n = jnp.linalg.norm(cross, axis=-1, keepdims=True)
    return cross / jnp.maximum(n, jnp.finfo(vertices.dtype).tiny)


def vertex_normals_from_mesh(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    area_weighted: bool = True,
) -> jnp.ndarray:
    """Per-vertex normals from incident faces.

    area_weighted=True is the reference's area-weighted variant
    (normalCompute.hpp:150-306): the raw cross product is proportional to
    twice the triangle area, so summing unnormalized crosses applies the
    weights for free. The plain variant (:34-147) sums unit face normals.
    Vertices with no incident face get [0, 0, 0] — the reference's "single
    point" convention its error metrics skip (:459-463)."""
    vertices = jnp.asarray(vertices)
    faces = jnp.asarray(faces)
    v = vertices.shape[0]
    a = vertices[faces[:, 0]]
    cross = jnp.cross(vertices[faces[:, 1]] - a, vertices[faces[:, 2]] - a)
    contrib = cross if area_weighted else facet_normals(vertices, faces)
    acc = jnp.zeros((v, 3), vertices.dtype)
    for corner in range(3):
        acc = acc.at[faces[:, corner]].add(contrib)
    norms = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    return jnp.where(
        norms > 0, acc / jnp.maximum(norms, jnp.finfo(vertices.dtype).tiny), 0.0
    )


def normal_angle_errors(
    estimated: jnp.ndarray, reference: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point sign-invariant angle error in radians plus a validity mask.

    Mirrors max/aveErrorNormalMeasure (normalCompute.hpp:439-564): the angle
    is min(∠(n1, n2), ∠(n1, −n2)) with the cosine clamped to [−1, 1]; rows
    where either normal is exactly zero are "single points", excluded from
    the reductions (the reference counts and skips them)."""
    n1 = jnp.asarray(estimated)
    n2 = jnp.asarray(reference)
    valid = (jnp.sum(n1 * n1, axis=-1) > 0) & (jnp.sum(n2 * n2, axis=-1) > 0)
    dot = jnp.sum(n1 * n2, axis=-1)
    den = jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1)
    h = jnp.clip(dot / jnp.maximum(den, jnp.finfo(n1.dtype).tiny), -1.0, 1.0)
    angle = jnp.arccos(jnp.abs(h))  # min(acos(h), acos(-h)) == acos(|h|)
    return angle, valid


def normal_error_measure(estimated, reference) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(max error, mean error, excluded 'single point' count) — the pair of
    reductions the reference prints (normalCompute.hpp:439-564)."""
    angle, valid = normal_angle_errors(estimated, reference)
    w = valid.astype(angle.dtype)
    max_err = jnp.max(jnp.where(valid, angle, -jnp.inf))
    mean_err = jnp.sum(angle * w) / jnp.maximum(jnp.sum(w), 1.0)
    return max_err, mean_err, jnp.sum(~valid)
