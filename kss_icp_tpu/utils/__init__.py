from kss_icp_tpu.utils.profiling import StageTimer, trace_annotation

__all__ = ["StageTimer", "trace_annotation"]
