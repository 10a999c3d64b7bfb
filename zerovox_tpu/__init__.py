"""zerovox-tpu: TPU-native zero-shot realtime text-to-speech framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of gooofy/zerovox
(reference: /root/reference): a FastSpeech2-style non-autoregressive acoustic
model with duration/pitch/energy variance adaptors and speaker-conditional
layer norm, a ResNetSE34V2 zero-shot speaker encoder, FFT-block and
StyleTTS/AdaIN mel decoders, and a HiFi-GAN vocoder — compiled as fused,
statically-shaped XLA programs with chunked streaming synthesis.

Public API mirrors the reference's surface (reference zerovox/tts/synthesize.py):

    from zerovox_tpu import ZeroVoxTTS
    modelcfg, synth = ZeroVoxTTS.load_model(model_dir, meldec_model=...)
    spkemb = synth.speaker_embed(wav)
    wav, phoneme, length = synth.tts("hello world", spkemb)
"""

__version__ = "0.1.0"

from zerovox_tpu.symbols import Symbols

__all__ = ["Symbols", "__version__"]


def __getattr__(name):
    # Lazy imports keep `import zerovox_tpu` fast (no jax/flax import cost
    # until a model-level symbol is actually used).
    if name == "ZeroVoxTTS":
        from zerovox_tpu.synthesize import ZeroVoxTTS

        return ZeroVoxTTS
    if name == "ZeroVox":
        from zerovox_tpu.models.zerovox import ZeroVox

        return ZeroVox
    raise AttributeError(f"module 'zerovox_tpu' has no attribute {name!r}")
