from kss_icp_tpu.core.cloud import PointCloud
from kss_icp_tpu.core.transforms import (
    Similarity,
    apply_similarity,
    compose,
    euler_xyz_matrix,
    rot_x,
    rot_y,
    rot_z,
)
from kss_icp_tpu.core.preshape import masked_centroid, masked_mean_radius, middle_align

__all__ = [
    "PointCloud",
    "Similarity",
    "apply_similarity",
    "compose",
    "euler_xyz_matrix",
    "rot_x",
    "rot_y",
    "rot_z",
    "masked_centroid",
    "masked_mean_radius",
    "middle_align",
]
