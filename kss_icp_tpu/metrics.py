"""Registration quality metrics — the PCR_QM contract.

Mirrors registrationMeasure.hpp:47-98: for every aligned source point, the
squared distance to its 1-NN in the target; MSE = mean of squares,
MAE = mean of distances, RMSE = sqrt(MSE). The reference runs ~|A| serial
k-d-tree queries; here it is one masked pairwise matmul + row-min (chunked
over the query axis for large clouds).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from kss_icp_tpu.core.cloud import PointCloud
from kss_icp_tpu.ops.nn import nearest_neighbor


@partial(jax.jit, static_argnames=("chunk", "use_pallas", "pallas_interpret"))
def registration_measure_padded(
    aligned_points: jnp.ndarray,
    aligned_mask: jnp.ndarray,
    target_points: jnp.ndarray,
    target_mask: jnp.ndarray,
    chunk: int | None = 4096,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    if use_pallas:
        from kss_icp_tpu.ops.nn_pallas import nearest_neighbor_pallas

        d2, _ = nearest_neighbor_pallas(
            aligned_points.astype(jnp.float32),
            target_points.astype(jnp.float32),
            target_mask,
            interpret=pallas_interpret,
        )
        d2 = d2.astype(aligned_points.dtype)
    else:
        d2, _ = nearest_neighbor(
            aligned_points, target_points, target_mask, chunk=chunk
        )
    w = aligned_mask.astype(d2.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mse = jnp.sum(d2 * w) / n
    mae = jnp.sum(jnp.sqrt(d2) * w) / n
    return {"mse": mse, "rmse": jnp.sqrt(mse), "mae": mae}


def registration_measure(
    aligned: Union[PointCloud, np.ndarray],
    target: Union[PointCloud, np.ndarray],
    chunk: int | None = 4096,
    use_pallas: bool | None = None,
) -> Dict[str, float]:
    """Host-facing MSE/RMSE/MAE (floats).

    use_pallas=None auto-routes: full-resolution clouds (≥2^15 query rows)
    on a TPU go through the streaming Pallas 1-NN (HBM O(Q+R) instead of the
    chunked O(chunk·R) matrices); smaller inputs and CPU use the XLA path."""
    if not isinstance(aligned, PointCloud):
        aligned = PointCloud.from_points(aligned)
    if not isinstance(target, PointCloud):
        target = PointCloud.from_points(target)
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu and aligned.points.shape[0] >= 32768
    out = registration_measure_padded(
        aligned.points, aligned.mask, target.points, target.mask, chunk=chunk,
        use_pallas=use_pallas, pallas_interpret=use_pallas and not on_tpu,
    )
    return {k: float(v) for k, v in out.items()}
