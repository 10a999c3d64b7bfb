from zerovox_tpu.dsp.mels import MelFrontend, mel_filterbank, get_mel_from_wav

__all__ = ["MelFrontend", "mel_filterbank", "get_mel_from_wav"]
