"""Production serving: dynamic micro-batching + a dependency-free HTTP front.

The reference has no serving layer — its only entry point is the interactive
demo loop (zerovox/demo.py:100-170, one utterance at a time on one process).
This package is the TPU-first equivalent of what production deployment needs:
concurrent requests are grouped into single `tts_batch` XLA programs
(synthesize.py — padded static buckets, speculative decode dispatch, optional
mesh row sharding), so one engine saturates a chip or a data-axis mesh slice
instead of running sequential batch-1 programs.
"""

from zerovox_tpu.serving.batcher import (STREAM_EOS, BatcherStats,
                                         DynamicBatcher)
from zerovox_tpu.serving.server import VoiceRegistry, make_server

__all__ = ["STREAM_EOS", "BatcherStats", "DynamicBatcher", "VoiceRegistry",
           "make_server"]
