"""Mesh triangle-angle statistics — the reference's `MeshMeasure`
(meshMeasure.hpp:25-329, not in the reference build; remesh-quality QA).

MeshMeasure_CountAngle walks every triangle and emits its three interior
corner angles; the driver then histograms them and counts sub-threshold
(sliver) angles. Here the whole walk is three batched arccos evaluations
over (F, 3) gathers — one fused XLA program, no per-triangle loop."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def triangle_angles(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Interior angles (F, 3) in radians of each triangle's corners, in face
    vertex order (meshMeasure.hpp:30-90: angle at b1, b2, b3)."""
    vertices = jnp.asarray(vertices)
    faces = jnp.asarray(faces)
    a = vertices[faces[:, 0]]
    b = vertices[faces[:, 1]]
    c = vertices[faces[:, 2]]

    def corner(p, q, r):
        u = q - p
        v = r - p
        num = jnp.sum(u * v, axis=-1)
        den = jnp.linalg.norm(u, axis=-1) * jnp.linalg.norm(v, axis=-1)
        h = jnp.clip(num / jnp.maximum(den, jnp.finfo(vertices.dtype).tiny), -1.0, 1.0)
        return jnp.arccos(h)

    return jnp.stack([corner(a, b, c), corner(b, a, c), corner(c, a, b)], axis=-1)


def angle_statistics(
    angles: jnp.ndarray,
    bins: int = 18,
    sliver_threshold_deg: float = 30.0,
) -> Dict[str, np.ndarray]:
    """Min/max/mean angle, a [0, pi] histogram, and the sliver-angle count —
    the aggregate the reference driver printed from the angle list."""
    flat = jnp.ravel(jnp.asarray(angles))
    hist, edges = jnp.histogram(flat, bins=bins, range=(0.0, float(jnp.pi)))
    return {
        "min": np.asarray(jnp.min(flat)),
        "max": np.asarray(jnp.max(flat)),
        "mean": np.asarray(jnp.mean(flat)),
        "histogram": np.asarray(hist),
        "bin_edges": np.asarray(edges),
        "sliver_count": np.asarray(
            jnp.sum(flat < jnp.deg2rad(sliver_threshold_deg))
        ),
        "count": np.asarray(flat.shape[0]),
    }


def mesh_angle_report(vertices, faces, **kwargs) -> Dict[str, np.ndarray]:
    """MeshMeasure_CountAngle + aggregation in one call."""
    return angle_statistics(triangle_angles(vertices, faces), **kwargs)
