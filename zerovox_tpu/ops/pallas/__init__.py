from zerovox_tpu.ops.pallas.resblock import fused_resblock1, resblock1_reference

__all__ = ["fused_resblock1", "resblock1_reference"]
