from kss_icp_tpu.ops.nn import (
    masked_mean_nn_distance,
    nearest_neighbor,
    pairwise_sqdist,
)
from kss_icp_tpu.ops.resample import farthest_point_sampling, voxel_downsample

__all__ = [
    "pairwise_sqdist",
    "nearest_neighbor",
    "masked_mean_nn_distance",
    "farthest_point_sampling",
    "voxel_downsample",
]
