from zerovox_tpu.ops.length_regulator import length_regulate, get_mask_from_lengths

__all__ = ["length_regulate", "get_mask_from_lengths"]
