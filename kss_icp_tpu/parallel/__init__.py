from kss_icp_tpu.parallel.mesh import make_mesh
from kss_icp_tpu.parallel.batch import register_batch
from kss_icp_tpu.parallel.rotation_shard import score_rotation_field_sharded

__all__ = ["make_mesh", "register_batch", "score_rotation_field_sharded"]
