from zerovox_tpu.text.normalize import ZeroVoxNormalizer, zerovox_normalize
from zerovox_tpu.text.tokenizer import transcript2phonemids, text2phonemeids

__all__ = [
    "ZeroVoxNormalizer",
    "zerovox_normalize",
    "transcript2phonemids",
    "text2phonemeids",
]
