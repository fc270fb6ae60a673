"""WLOP (Weighted Locally Optimal Projection) resampling.

The reference calls CGAL::wlop_simplify_and_regularize_point_set to build
its 8000-point `.wlop` benchmark fixtures (Method_CGAL.hpp:123-159,
transferPC.hpp:144-151). WLOP iterates two dense kernels per step —
attraction of each sample to the input density and repulsion between
samples — both of which are masked pairwise-distance matmuls + weighted
row-sums: exactly the op the MXU is built for. The CPU implementation
needs spatial grids + TBB; here the whole solver is one jitted
`fori_loop` over (M x N) and (M x M) tiles.

  x_i <- sum_j p_j a_ij / sum_j a_ij
         + mu * (sum_{i'!=i} (x_i - x_{i'}) b_ii') / sum b_ii'
  a = theta(r)/r,  b = theta(r)/r,  theta(r) = exp(-16 r^2 / h^2)

(Lipman et al. 2007; CGAL's formulation with uniform density weights.)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from kss_icp_tpu.ops.nn import pairwise_sqdist
from kss_icp_tpu.ops.resample import farthest_point_sampling

_BIG = 1e30


def default_radius(points: jnp.ndarray, mask: jnp.ndarray, num_samples: int):
    """Support radius h: ~2x the expected sample spacing on a surface,
    estimated from the bounding-box diagonal."""
    big = jnp.where(mask[:, None], points, _BIG)
    small = jnp.where(mask[:, None], points, -_BIG)
    diag = jnp.linalg.norm(jnp.max(small, axis=0) - jnp.min(big, axis=0))
    # ~4x the expected surface sample spacing diag/(2*sqrt(M)); swept on the
    # wavy-surface fixture: h=2d/sqrt(M) minimizes spacing CV (0.107 vs FPS
    # 0.127) while staying on-surface.
    return 2.0 * diag / jnp.sqrt(jnp.asarray(float(num_samples), points.dtype))


@partial(jax.jit, static_argnames=("num_samples", "iterations"))
def wlop_resample(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    num_samples: int,
    iterations: int = 20,
    mu: float = 0.45,
    radius: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resample to `num_samples` regularized points.

    Returns (samples (num_samples, 3), sample_mask). Initialized with FPS
    (already near-uniform, so few iterations are needed).
    """
    dtype = points.dtype
    eps = jnp.finfo(dtype).tiny
    idx, smask = farthest_point_sampling(points, mask, num_samples)
    x0 = points[idx]
    h = default_radius(points, mask, num_samples) if radius is None else radius
    inv_h2 = 16.0 / jnp.maximum(h * h, eps)
    w_in = mask.astype(dtype)
    w_s = smask.astype(dtype)

    def step(_, x):
        # Attraction to the input cloud.
        d2_in = pairwise_sqdist(x, points)  # (M, N)
        r_in = jnp.sqrt(jnp.maximum(d2_in, eps))
        alpha = jnp.exp(-d2_in * inv_h2) / r_in * w_in[None, :]
        denom_a = jnp.maximum(jnp.sum(alpha, axis=1, keepdims=True), eps)
        attract = (alpha @ points) / denom_a

        # Repulsion between samples.
        d2_s = pairwise_sqdist(x, x)  # (M, M)
        r_s = jnp.sqrt(jnp.maximum(d2_s, eps))
        beta = jnp.exp(-d2_s * inv_h2) / r_s * w_s[None, :]
        beta = beta * (1.0 - jnp.eye(x.shape[0], dtype=dtype))
        denom_b = jnp.maximum(jnp.sum(beta, axis=1, keepdims=True), eps)
        diff = x[:, None, :] - x[None, :, :]
        repulse = jnp.einsum(
            "mk,mki->mi", beta, diff, precision=jax.lax.Precision.HIGHEST
        ) / denom_b

        x_new = attract + mu * repulse
        return jnp.where(w_s[:, None] > 0, x_new, x)

    x = jax.lax.fori_loop(0, iterations, step, x0)
    return x * w_s[:, None], smask
