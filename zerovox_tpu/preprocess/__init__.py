from zerovox_tpu.preprocess.ctc_align import TokenSpan, forced_align, merge_tokens

__all__ = ["TokenSpan", "forced_align", "merge_tokens"]
