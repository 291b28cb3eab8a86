from honerf_tpu.ops.fused_sdf import FusedObjSDF

__all__ = ["FusedObjSDF"]
