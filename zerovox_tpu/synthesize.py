"""ZeroVoxTTS: the synthesis API.

Surface parity with the reference (zerovox/tts/synthesize.py:38-328):
``load_model`` / ``speaker_embed`` / ``tts`` / ``tts_ex`` /
``text2phonemeids`` / ``available_speakerrefs`` — but the execution model is
TPU-native (SURVEY.md §7):

  * Text and mel lengths are padded to static **buckets**; each
    (text-bucket), (text,mel-bucket) and (mel-bucket) combination compiles to
    one cached XLA program — no recompiles across utterances, no
    high-water-mark hack (reference model.py:330-335).
  * Synthesis is three jitted programs: stage A (phoneme encoder + variance
    predictors, text-bucket shaped), stage B (length-regulate + mel decoder,
    chosen from the predicted mel length with one scalar host sync), and the
    vocoder per mel bucket.
  * ``tts_stream`` yields audio chunk-by-chunk (chunked vocoding with
    receptive-field halos, zerovox_tpu/streaming.py) for sub-100 ms first
    audio — a capability the reference lacks (whole-utterance vocoding only,
    model.py:337).
"""

from __future__ import annotations

import functools
import glob
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from zerovox_tpu import hub
from zerovox_tpu.config import ZeroVoxConfig
from zerovox_tpu.dsp.audio import load_wav, trim_silence
from zerovox_tpu.dsp.mels import MelFrontend
from zerovox_tpu.models.hifigan import HifiGanConfig, MelDec
from zerovox_tpu.models.zerovox import ZeroVox
from zerovox_tpu.symbols import Symbols
from zerovox_tpu.text.normalize import ZeroVoxNormalizer
from zerovox_tpu.text.tokenizer import transcript2phonemids
from zerovox_tpu.utils.profiling import StageTimer

DEFAULT_REFAUDIO = "en_kevin.wav"

# static-shape buckets (SURVEY.md §7.1)
TEXT_BUCKETS = (16, 32, 64, 96, 128, 192, 256, 384, 512)
MEL_BUCKETS = (96, 176, 344, 512, 689, 1024, 1408, 1750)


def pick_bucket(n: int, buckets) -> int:
    for b in buckets:
        if b >= n:
            return b
    return ((n + 127) // 128) * 128  # beyond the largest bucket: 128-grid


class ZeroVoxTTS:
    """End-to-end zero-shot TTS engine."""

    def __init__(
        self,
        cfg: ZeroVoxConfig,
        variables: dict,
        meldec_cfg: HifiGanConfig,
        meldec_variables: dict,
        language: str | None = None,
        verbose: bool = False,
        meldec_model: str = "",
        precision: str | None = None,
        mesh: jax.sharding.Mesh | None = None,
    ):
        """`mesh` (optional): a jax Mesh with a "data" axis. Batch serving
        (`tts_batch`) then shards utterance rows across the mesh — params are
        replicated, XLA SPMD runs each shard's decode+vocode on its own
        device over ICI, and results gather on fetch. Single-utterance paths
        (`tts`, `tts_stream`) are unaffected (B=1 cannot shard)."""
        self.cfg = cfg
        self._verbose = verbose
        self._meldec_model = meldec_model
        self._symbols = Symbols(phones=cfg.model.phones, puncts=cfg.model.puncts)
        self._normalizer = ZeroVoxNormalizer(language or cfg.langs[0])

        self._model = ZeroVox(cfg)
        # fused-MRF Pallas vocoder: measured 1.15-5x device-time win at
        # batch 1 on v5e (docs/PERFORMANCE.md §Pallas), parity at batch>1 —
        # so "auto" (default) enables it on TPU for single-utterance programs
        # only (the Generator routes per static batch size). "1" forces it on
        # for all batches, "0" disables (CPU has no compiled Pallas).
        flag = os.environ.get("ZEROVOX_USE_PALLAS", "auto")
        use_pallas = (flag == "1") or (flag == "auto" and jax.default_backend() == "tpu")
        self._meldec = MelDec(meldec_cfg, use_pallas=use_pallas,
                              pallas_all_batches=flag == "1")
        self._meldec_cfg = meldec_cfg
        # Pin weights on the accelerator once — host-resident params would
        # otherwise re-upload on every jitted call, which dominates latency on
        # remote/tunneled TPU backends. The device must be explicit:
        # device_put without one leaves uncommitted CPU arrays where they are.
        # opt-in bf16 inference: halve HBM traffic and double MXU throughput
        # at ~3-decimal-digit precision (default f32 preserves torch parity)
        self._precision = precision or os.environ.get("ZEROVOX_PRECISION", "f32")
        if self._precision == "bf16":
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == np.float32 else x, t)
            variables = cast(variables)
            meldec_variables = cast(meldec_variables)

        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if "data" not in mesh.axis_names:
                raise ValueError("serving mesh must have a 'data' axis "
                                 f"(got {mesh.axis_names})")
            rep = NamedSharding(mesh, PartitionSpec())
            self._variables = jax.device_put(variables, rep)
            self._meldec_variables = jax.device_put(meldec_variables, rep)
            self._row_sharding = NamedSharding(mesh, PartitionSpec("data"))
        else:
            dev = jax.devices()[0]
            self._variables = jax.device_put(variables, dev)
            self._meldec_variables = jax.device_put(meldec_variables, dev)
            self._row_sharding = None
        jax.block_until_ready((self._variables, self._meldec_variables))

        a = cfg.audio
        self._hop_length = a.hop_size
        self._sampling_rate = a.sampling_rate
        self._frontend = MelFrontend(a.sampling_rate, a.fft_size, a.hop_size,
                                     a.win_length, a.num_mels, a.fmin, a.fmax)

        self._build_jit()

    # ----------------------------------------------------------- jit programs

    def _build_jit(self):
        model, meldec = self._model, self._meldec

        if self._precision == "bf16":
            def fcast(x):
                return x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x
        else:
            def fcast(x):
                return x

        @jax.jit
        def spk_embed(variables, ref_mel):
            return model.apply(variables, fcast(ref_mel), method=ZeroVox.speaker_embed)

        @jax.jit
        def encode(variables, phonemes, puncts, mask, style):
            return model.apply(variables, phonemes, puncts, fcast(style),
                               phoneme_mask=mask, method=ZeroVox.encode)

        @jax.jit
        def encode_forced(variables, phonemes, puncts, mask, style, duration):
            return model.apply(variables, phonemes, puncts, fcast(style),
                               phoneme_mask=mask, duration_target=duration,
                               method=ZeroVox.encode)

        @functools.partial(jax.jit, static_argnames=("max_mel_len",))
        def decode(variables, x, durations, style, max_mel_len):
            return model.apply(variables, fcast(x), durations, fcast(style),
                               max_mel_len, method=ZeroVox.decode)

        @jax.jit
        def vocode(variables, mel):
            return meldec.apply(variables, fcast(mel)).astype(jnp.float32)

        @functools.partial(jax.jit, static_argnames=("n",))
        def slice_wav(wav, n):
            # device-side trim of the padded speculative bucket before the
            # host fetch — for large batches the padded transfer, not
            # compute, is the batch-serving wall (PERFORMANCE.md round 3)
            return wav[:, :n]

        @jax.jit
        def wav_i16(wav):
            # 16-bit wire format for the device->host waveform fetch: halves
            # the bytes over the ~15 MB/s tunneled link; quantization error
            # (<=1.5e-5) is far inside the 1e-2 fidelity envelope and equals
            # what demo/save_wav write to disk anyway (int16 PCM at *32760)
            return jnp.clip(wav * 32760.0, -32768.0, 32767.0).astype(jnp.int16)

        self._jit_spk_embed = spk_embed
        self._jit_encode = encode
        self._jit_encode_forced = encode_forced
        self._jit_decode = decode
        self._jit_vocode = vocode
        self._jit_slice_wav = slice_wav
        self._jit_wav_i16 = wav_i16
        flag = os.environ.get("ZEROVOX_WIRE_DTYPE", "auto")
        self._wire_i16 = (flag == "i16") or (flag == "auto"
                                             and jax.default_backend() == "tpu")

    # ------------------------------------------------------------ public API

    @property
    def normalizer(self):
        return self._normalizer

    @property
    def language(self) -> str:
        return self._normalizer.language

    @language.setter
    def language(self, value: str):
        if value != self._normalizer.language:
            self._normalizer = ZeroVoxNormalizer(value)

    @property
    def meldec_model(self) -> str:
        return self._meldec_model

    @staticmethod
    def available_speakerrefs() -> list[str]:
        """Speaker reference wavs: any *.wav under the packaged refaudio dir
        and the ZEROVOX_REFAUDIO_DIR override (reference ships 68 wavs in
        zerovox/tts/refaudio; artifacts are distributed, not vendored here)."""
        speakers = []
        for d in ZeroVoxTTS._refaudio_dirs():
            if os.path.isdir(d):
                speakers.extend(f for f in os.listdir(d) if f.endswith(".wav"))
        return sorted(set(speakers), key=str.casefold)

    @staticmethod
    def _refaudio_dirs():
        dirs = []
        if os.getenv("ZEROVOX_REFAUDIO_DIR"):
            dirs.append(os.getenv("ZEROVOX_REFAUDIO_DIR"))
        dirs.append(str(Path(__file__).parent / "refaudio"))
        return dirs

    @staticmethod
    def get_speakerref(speakerref: str, sampling_rate: int) -> np.ndarray:
        if os.path.isfile(speakerref):
            wav, _ = load_wav(speakerref, target_sr=sampling_rate)
            return wav
        for d in ZeroVoxTTS._refaudio_dirs():
            p = os.path.join(d, speakerref)
            if os.path.isfile(p):
                wav, _ = load_wav(p, target_sr=sampling_rate)
                return wav
        raise FileNotFoundError(f"speaker reference wav not found: {speakerref}")

    def speaker_embed(self, wav: np.ndarray) -> jax.Array:
        """Reference wav -> [1, 1, emb] (run once per voice; reference
        zerovox/tts/synthesize.py:123-143)."""
        wav, _ = trim_silence(wav, top_db=40.0)
        mel, _ = self._frontend(wav)  # [n_mels, T]
        x = mel.T[None, :, :].astype(np.float32)
        return self._jit_spk_embed(self._variables, x)

    def text2phonemeids(self, text: str) -> tuple[list[int], list[int]]:
        transcript_uroman, _ = self._normalizer.normalize(text)
        phone_ids, punct_ids = transcript2phonemids(transcript_uroman, self._symbols)
        if self._verbose:
            print(f"Raw Text Sequence: {text}")
            print(f"Normalized       : {transcript_uroman}")
            print(f"Phoneme IDs      : {phone_ids}")
            print(f"Punct IDs        : {punct_ids}")
        return phone_ids, punct_ids

    # ------------------------------------------------------- synthesis core

    def _prepare_inputs(self, phone_ids, punct_ids, duration=None):
        L = pick_bucket(len(phone_ids), TEXT_BUCKETS)
        phonemes = np.zeros((1, L), dtype=np.int32)
        puncts = np.zeros((1, L), dtype=np.int32)
        mask = np.ones((1, L), dtype=bool)
        n = len(phone_ids)
        phonemes[0, :n] = phone_ids
        puncts[0, :n] = punct_ids
        mask[0, :n] = False
        dur = None
        if duration is not None:
            dur = np.zeros((1, L), dtype=np.int32)
            dur[0, :n] = duration[:n]
        return phonemes, puncts, mask, dur

    def _synthesize(self, phone_ids, punct_ids, spkemb, duration=None,
                    timer: StageTimer | None = None, want_mel: bool = True):
        """Returns (wav [N], mel_len int, log_duration, mel [n_mels, mel_len]
        or None when want_mel=False — skipping the mel device->host fetch)."""
        phonemes, puncts, mask, dur = self._prepare_inputs(phone_ids, punct_ids, duration)

        if dur is not None:
            enc = self._jit_encode_forced(self._variables, phonemes, puncts, mask, spkemb, dur)
            spec_len = int(dur.sum())
        else:
            enc = self._jit_encode(self._variables, phonemes, puncts, mask, spkemb)
            spec_len = self._SPEC_FRAMES_PER_PHONE * len(phone_ids) + 16

        # dispatch decode + vocode at a speculative bucket; the duration host
        # sync overlaps their device time (exact for any bucket >= mel_len)
        T_spec = pick_bucket(min(max(spec_len, 1), self.cfg.model.max_mel_len), MEL_BUCKETS)
        mel, _, _ = self._jit_decode(
            self._variables, enc["x"], enc["duration_rounded"], spkemb, T_spec)
        wav = self._jit_vocode(self._meldec_variables, mel)

        def fetch_buffer(w):
            # start the device->host copy immediately: on tunneled backends
            # the transfer (~RTT + bytes) then overlaps the duration sync
            # below instead of serializing behind it
            buf = self._jit_wav_i16(w) if self._wire_i16 else w
            try:
                buf.copy_to_host_async()
            except Exception:
                pass
            return buf

        wav_buf = fetch_buffer(wav)

        if dur is not None:
            # teacher-forced durations: the mel length is known host-side,
            # no device sync at all
            mel_len = int(dur.sum())
        else:
            mel_len = int(jnp.sum(enc["duration_rounded"]))  # overlapped host sync
        mel_len = max(min(mel_len, self.cfg.model.max_mel_len), 1)
        if timer:
            timer.mark("pe")

        if mel_len > T_spec:
            # speculation too small — redo at the exact bucket (rare)
            T = pick_bucket(mel_len, MEL_BUCKETS)
            mel, _, _ = self._jit_decode(
                self._variables, enc["x"], enc["duration_rounded"], spkemb, T)
            wav = self._jit_vocode(self._meldec_variables, mel)
            wav_buf = fetch_buffer(wav)

        if timer:
            mel.block_until_ready()
            timer.mark("dec")

        if self._wire_i16:
            i16 = np.asarray(wav_buf)[0, : mel_len * self._hop_length]
            wav_np = i16.astype(np.float32) / 32760.0
        else:
            wav_np = np.asarray(wav_buf)[0, : mel_len * self._hop_length]
        if timer:
            timer.mark("meldec")

        mel_np = np.asarray(mel)[0, :mel_len, :].T if want_mel else None
        return wav_np, mel_len, enc["log_duration"], mel_np

    def tts_ex(self, text: str, spkemb, duration=None, want_mel: bool = True):
        """(reference zerovox/tts/synthesize.py:213-239)."""
        text = text.strip()

        tstart_g2p = time.time()
        phone_ids, punct_ids = self.text2phonemeids(text)
        tend_g2p = time.time()

        if not phone_ids:
            return (np.array([[0.0]], dtype=np.float32),
                    np.array([[0]], dtype=np.int32), 0,
                    np.array([[0.0]], dtype=np.float32))

        timer = StageTimer() if self._verbose else None
        tstart_synth = time.time()
        wav, length, _, mel = self._synthesize(phone_ids, punct_ids, spkemb,
                                               duration=duration, timer=timer,
                                               want_mel=want_mel)
        tend_synth = time.time()

        if self._verbose:
            print(f"synthesis timing stats: {timer.report()}")
            print(f"tts timing stats: g2p={tend_g2p - tstart_g2p}s, synth={tend_synth - tstart_synth}s")

        phoneme = np.array([phone_ids], dtype=np.int32)
        return wav, phoneme, length, mel

    def tts(self, text: str, spkemb, duration=None):
        wav, phoneme, length, _ = self.tts_ex(text=text, spkemb=spkemb,
                                              duration=duration, want_mel=False)
        return wav, phoneme, length

    def tts_batch(self, texts: list[str], spkembs,
                  durations=None) -> list[tuple[np.ndarray, int]]:
        """Batched multi-speaker synthesis: one utterance per (text, speaker
        embedding) pair, padded to shared buckets so the whole batch runs as
        single XLA programs (BASELINE.md scenario: zero-shot cloning with
        batched multi-speaker synthesis). `spkembs` is [B, 1, emb] (stacked
        speaker_embed outputs). `durations`, if given, is one per-phone
        frame-count array per utterance (teacher forcing, like `tts`'s
        `duration=`): mel lengths are then known on the host, so the exact
        bucket is decoded directly — no duration sync, no speculation, no
        trim. Returns [(wav, mel_len), ...]."""
        B = len(texts)
        assert spkembs.shape[0] == B

        ids = [self.text2phonemeids(t.strip()) for t in texts]
        max_n = max((len(p) for p, _ in ids), default=0)
        if max_n == 0:
            return [(np.zeros(1, np.float32), 0)] * B
        L = pick_bucket(max_n, TEXT_BUCKETS)

        # mesh serving: round the row count up to the data-axis size so each
        # device gets equal shards; pad rows are fully masked (mel_len 0) and
        # dropped by _batch_postprocess's range(B)
        Bp = B
        if self._mesh is not None:
            nd = self._mesh.shape["data"]
            Bp = -(-B // nd) * nd

        phonemes = np.zeros((Bp, L), np.int32)
        puncts = np.zeros((Bp, L), np.int32)
        mask = np.ones((Bp, L), dtype=bool)
        for i, (p, q) in enumerate(ids):
            phonemes[i, : len(p)] = p
            puncts[i, : len(p)] = q
            mask[i, : len(p)] = False

        if Bp != B:
            spkembs = np.concatenate(
                [np.asarray(spkembs, np.float32),
                 np.zeros((Bp - B,) + tuple(np.shape(spkembs)[1:]), np.float32)])
        if self._row_sharding is not None:
            phonemes, puncts, mask, spkembs = jax.device_put(
                (phonemes, puncts, mask, np.asarray(spkembs, np.float32)),
                self._row_sharding)

        if durations is not None:
            return self._tts_batch_forced(ids, phonemes, puncts, mask,
                                          spkembs, durations, L)

        enc = self._jit_encode(self._variables, phonemes, puncts, mask, spkembs)

        # speculative bucket from the max phone count (same latency trick as
        # the single-utterance path, synthesize.py:_synthesize): decode +
        # vocode dispatch immediately and the per-row duration fetch overlaps
        # their device time; masked decode is exact for any bucket >= mel_len
        spec_len = self._SPEC_FRAMES_PER_PHONE * max_n + 16
        T_spec = pick_bucket(min(max(spec_len, 1), self.cfg.model.max_mel_len),
                             MEL_BUCKETS)
        mel, _, _ = self._jit_decode(
            self._variables, enc["x"], enc["duration_rounded"], spkembs, T_spec)
        wav_dev = self._jit_vocode(self._meldec_variables, mel)

        def fetch_buffer(w):
            buf = self._jit_wav_i16(w) if self._wire_i16 else w
            try:
                buf.copy_to_host_async()
            except Exception:
                pass
            return buf

        # Fetch policy: starting the host copy of the *speculative* bucket's
        # waveform immediately overlaps the ~33 ms duration-sum RTT — but the
        # bucket is padded (12 frames/phone vs ~5-7 typical), and for a large
        # batch the padded transfer costs more than the RTT it hides. Waiting
        # instead costs one extra blocking round trip (durations, then the
        # trimmed fetch) but moves far fewer bytes. Measured crossover on the
        # tunneled v5e link: eager wins up to ~4 MB padded (B=2: 83 vs
        # 104 ms; B=4: 145 vs 151), trimming wins at ~7 MB (B=8: 198 vs
        # 236 ms) — scripts/bench_serving.py --eager-bytes A/B, PERFORMANCE.md
        # round-3 serving table.
        padded_bytes = wav_dev.size * (2 if self._wire_i16 else 4)
        eager = padded_bytes <= self._BATCH_EAGER_FETCH_BYTES
        if eager:
            wav_buf = fetch_buffer(wav_dev)
        mel_lens = np.asarray(jnp.sum(enc["duration_rounded"], axis=1))  # overlapped when eager

        # clamp BEFORE comparing: a predicted length beyond max_mel_len is
        # served at the max bucket, which T_spec already is — an unclamped
        # compare would redo the identical programs for nothing
        eff_max = min(int(mel_lens.max()), self.cfg.model.max_mel_len)
        if eff_max > T_spec:
            # under-speculation (rare): redo at the exact bucket
            T_spec = pick_bucket(eff_max, MEL_BUCKETS)
            mel, _, _ = self._jit_decode(
                self._variables, enc["x"], enc["duration_rounded"], spkembs, T_spec)
            wav_dev = self._jit_vocode(self._meldec_variables, mel)
            eager = False
        if not eager:
            T_exact = pick_bucket(eff_max, MEL_BUCKETS)
            if T_exact < T_spec:
                wav_dev = self._jit_slice_wav(wav_dev,
                                              n=T_exact * self._hop_length)
            wav_buf = fetch_buffer(wav_dev)

        return self._batch_postprocess(wav_buf, mel_lens, B)

    def _tts_batch_forced(self, ids, phonemes, puncts, mask, spkembs,
                          durations, L):
        """tts_batch with teacher-forced per-phone durations: the exact mel
        bucket is known on the host, so this is one straight-line dispatch
        chain with a single (async-overlapped) waveform fetch."""
        B = phonemes.shape[0]  # row count incl. any mesh padding
        dur = np.zeros((B, L), np.int32)
        for i, (p, _) in enumerate(ids):
            d = np.asarray(durations[i], np.int32)
            if d.shape[0] != len(p):
                raise ValueError(
                    f"durations[{i}] has {d.shape[0]} entries for {len(p)} phones")
            dur[i, : len(p)] = d
        mel_lens = np.minimum(dur.sum(axis=1), self.cfg.model.max_mel_len)

        dur_dev = (jax.device_put(dur, self._row_sharding)
                   if self._row_sharding is not None else jnp.asarray(dur))
        enc = self._jit_encode_forced(self._variables, phonemes, puncts,
                                      mask, spkembs, dur_dev)
        T = pick_bucket(min(int(mel_lens.max()), self.cfg.model.max_mel_len),
                        MEL_BUCKETS)
        mel, _, _ = self._jit_decode(
            self._variables, enc["x"], enc["duration_rounded"], spkembs, T)
        wav_dev = self._jit_vocode(self._meldec_variables, mel)
        wav_buf = self._jit_wav_i16(wav_dev) if self._wire_i16 else wav_dev
        try:
            wav_buf.copy_to_host_async()
        except Exception:
            pass
        # len(ids) = requested rows (B includes mesh padding rows)
        return self._batch_postprocess(wav_buf, mel_lens, len(ids))

    def _batch_postprocess(self, wav_buf, mel_lens, B):
        if self._wire_i16:
            wav = np.asarray(wav_buf).astype(np.float32) / 32760.0
        else:
            wav = np.asarray(wav_buf)

        out = []
        for i in range(B):
            n = int(min(mel_lens[i], self.cfg.model.max_mel_len))
            out.append((wav[i, : n * self._hop_length], n))
        return out

    # generous upper bound on avg frames/phone for speculative bucketing
    # (~12 frames = 140 ms per phone; typical speech averages 5-7)
    _SPEC_FRAMES_PER_PHONE = 12
    # tts_batch: max padded-waveform bytes worth fetching eagerly (overlaps
    # the duration RTT). Above this the padded transfer costs more than the
    # extra blocking round trip of the trim-then-fetch path — measured
    # crossover between 3.6 and 7.2 MB on the tunneled v5e (see fetch-policy
    # comment in tts_batch).
    _BATCH_EAGER_FETCH_BYTES = 5_000_000

    def tts_stream(self, text: str, spkemb, chunk_frames: int = 96, duration=None):
        """Streaming synthesis: yields waveform chunks as they are vocoded.

        Latency design: the mel bucket is chosen *speculatively* from the
        phone count, so the decoder + first-chunk vocoder are dispatched
        back-to-back without waiting for the duration-sum host sync — the
        masked decoder output is exact for any bucket >= the true mel length,
        and in the (pathological) case the speculation was too small the
        stream transparently redoes the decode at the correct bucket before
        emitting anything."""
        from zerovox_tpu.streaming import stream_vocode

        phone_ids, punct_ids = self.text2phonemeids(text.strip())
        if not phone_ids:
            return

        phonemes, puncts, mask, dur = self._prepare_inputs(phone_ids, punct_ids, duration)
        if dur is not None:
            enc = self._jit_encode_forced(self._variables, phonemes, puncts, mask, spkemb, dur)
            spec_len = int(dur.sum())
        else:
            enc = self._jit_encode(self._variables, phonemes, puncts, mask, spkemb)
            spec_len = self._SPEC_FRAMES_PER_PHONE * len(phone_ids) + 16

        from zerovox_tpu.streaming import ChunkStreamer

        T_spec = pick_bucket(min(max(spec_len, 1), self.cfg.model.max_mel_len), MEL_BUCKETS)
        # dispatch decode + first vocoder window speculatively — the duration
        # host sync overlaps their device time instead of gating them
        mel, _, _ = self._jit_decode(
            self._variables, enc["x"], enc["duration_rounded"], spkemb, T_spec)
        streamer = ChunkStreamer(self._meldec, self._meldec_variables,
                                 self._meldec_cfg, mel, chunk_frames,
                                 wire_i16=self._wire_i16)
        first_wav = streamer.dispatch(0)

        if dur is not None:
            true_len = spec_len  # forced: known host-side, no device sync
        else:
            true_len = int(jnp.sum(enc["duration_rounded"]))  # overlapped sync
        mel_len = max(min(true_len, self.cfg.model.max_mel_len), 1)

        if mel_len > T_spec:
            # speculation too small (>12 frames/phone avg): redo exactly —
            # a truncated decode grid changes attention, so nothing emitted yet
            T = pick_bucket(mel_len, MEL_BUCKETS)
            mel, _, _ = self._jit_decode(
                self._variables, enc["x"], enc["duration_rounded"], spkemb, T)
            yield from stream_vocode(
                self._meldec, self._meldec_variables, self._meldec_cfg,
                mel, mel_len, self._hop_length, chunk_frames=chunk_frames,
                wire_i16=self._wire_i16)
            return

        yield from streamer.chunks(mel_len, pos=0, first_wav=first_wav)

    _SENTENCE_SPLIT = None

    def tts_stream_text(self, text: str, spkemb, chunk_frames: int = 96):
        """Continuous streaming over arbitrarily long text (the realtime
        LLM-backend trace, BASELINE.md scenario 5): the text is split into
        sentences/clauses, each synthesized and chunk-streamed back-to-back,
        so first audio stays sub-100 ms regardless of input length and texts
        longer than max_txt_len never hit one giant program."""
        import re

        if ZeroVoxTTS._SENTENCE_SPLIT is None:
            ZeroVoxTTS._SENTENCE_SPLIT = re.compile(r"(?<=[.!?;:])\s+")

        pieces: list[str] = []
        for sentence in ZeroVoxTTS._SENTENCE_SPLIT.split(text.strip()):
            sentence = sentence.strip()
            if not sentence:
                continue
            # clause-split anything still over the text budget
            while len(sentence) > self.cfg.model.max_txt_len:
                cut = sentence.rfind(",", 0, self.cfg.model.max_txt_len)
                cut = cut if cut > 0 else self.cfg.model.max_txt_len
                pieces.append(sentence[:cut + 1])
                sentence = sentence[cut + 1 :].strip()
            pieces.append(sentence)

        for piece in pieces:
            yield from self.tts_stream(piece, spkemb, chunk_frames=chunk_frames)

    def warmup(self, texts=("This is a warmup utterance.",), spkemb=None,
               mel_buckets=None, batch_sizes=()):
        """Compile the bucket programs ahead of serving. With `mel_buckets`
        (e.g. MEL_BUCKETS for full coverage) every given mel bucket's decode +
        vocode program is also compiled via forced durations, so production
        traffic never hits a compile. `batch_sizes` additionally compiles
        the `tts_batch` programs at those batch sizes (pass the sizes a
        serving frontend will dispatch; on a serving mesh they round up to
        the data-axis size, so one representative size usually suffices)."""
        if spkemb is None:
            spkemb = jnp.zeros((1, 1, self.cfg.model.emb_size), dtype=jnp.float32)
        for t in texts:
            self.tts(t, spkemb)
        if mel_buckets:
            ids, _ = self.text2phonemeids(texts[0])
            n = max(len(ids), 1)
            for T in mel_buckets:
                if T > self.cfg.model.max_mel_len:
                    continue
                dur = np.full(n, max(1, T // n), dtype=np.int32)
                dur[-1] += T - int(dur.sum())  # land exactly in bucket T
                self.tts(texts[0], spkemb, duration=dur)
        for B in batch_sizes:
            # host arrays, like production callers pass: a committed device
            # array would key a different jit cache entry than the real call
            embs = np.tile(np.asarray(spkemb, np.float32), (B, 1, 1))
            self.tts_batch([texts[0]] * B, embs)
        if self._verbose:
            from zerovox_tpu.utils.compile_cache import format_cache_stats

            print(f"warmup done; {format_cache_stats()}")

    def summary(self, depth: int = 1, ref_mel=None):
        """Parameter-count summary (reference uses torchinfo, synthesize.py:245-266)."""
        counts = jax.tree.map(lambda x: int(np.prod(np.asarray(x).shape)), self._variables["params"])
        total = sum(jax.tree.leaves(counts))
        print(f"ZeroVox acoustic model parameters: {total:,}")
        for name, sub in self._variables["params"].items():
            n = sum(jax.tree.leaves(jax.tree.map(lambda x: int(np.prod(np.asarray(x).shape)), sub)))
            print(f"  {name}: {n:,}")
        mc = sum(jax.tree.leaves(jax.tree.map(lambda x: int(np.prod(np.asarray(x).shape)),
                                              self._meldec_variables["params"])))
        print(f"meldec (vocoder) parameters: {mc:,}")
        return total

    # ------------------------------------------------------------- loaders

    @classmethod
    def load_model(cls, modelpath, meldec_model, infer_device: str = "",
                   num_threads: int = -1, verbose: bool = False,
                   mesh: jax.sharding.Mesh | None = None):
        """Resolve modelcfg.yaml + newest checkpoint from a local dir or the
        hub (reference zerovox/tts/synthesize.py:286-328). Returns
        (modelcfg dict, ZeroVoxTTS). `infer_device`/`num_threads` are accepted
        for API compatibility; device placement is JAX's. `mesh` enables
        data-parallel batch serving (see ZeroVoxTTS.__init__)."""
        if os.path.isdir(modelpath):
            config_path = Path(modelpath) / "modelcfg.yaml"
            ckpts = glob.glob(os.path.join(modelpath, "checkpoints/*.ckpt"))
            ckpts += glob.glob(os.path.join(modelpath, "checkpoints/*.msgpack"))
            checkpoint = max(ckpts, key=os.path.getctime)
        else:
            config_path = hub.download_model_file(model=str(modelpath), relpath="modelcfg.yaml")
            checkpoint = hub.download_model_file(model=str(modelpath), relpath="checkpoint.pkl")

        if verbose:
            print("synthesize: using config    : ", config_path)
            print("synthesize: using checkpoint: ", checkpoint)

        with open(config_path) as f:
            modelcfg = yaml.load(f, Loader=yaml.FullLoader)
        cfg = ZeroVoxConfig.from_dict(modelcfg)

        variables, embedded_meldec = cls._load_acoustic_variables(checkpoint, cfg)
        meldec_cfg, meldec_vars = cls._load_meldec(meldec_model, embedded_meldec, verbose)

        synth = cls(cfg, variables, meldec_cfg, meldec_vars,
                    language=cfg.langs[0], verbose=verbose,
                    meldec_model=str(meldec_model), mesh=mesh)
        return modelcfg, synth

    @staticmethod
    def _load_acoustic_variables(checkpoint, cfg):
        checkpoint = str(checkpoint)
        if checkpoint.endswith(".msgpack"):
            from zerovox_tpu.training.checkpointing import load_native_checkpoint

            return load_native_checkpoint(checkpoint), None
        from zerovox_tpu.checkpoint import load_zerovox_checkpoint

        variables = load_zerovox_checkpoint(checkpoint, cfg)
        embedded = variables.pop("meldec_state_dict", None)
        return variables, embedded

    @staticmethod
    def _load_meldec(meldec_model, embedded_state_dict=None, verbose=False):
        """HiFi-GAN config.json + generator.ckpt from a local dir or the hub
        (reference zerovox/tts/model.py:86-118); weight norm folded at import.

        A dir holding `generator.msgpack` (written by zerovox-train-vocoder,
        training/vocoder.py) loads natively — an in-repo-trained vocoder is
        a drop-in meldec for demo/serving/streaming."""
        from zerovox_tpu.checkpoint import _SD, convert_hifigan_generator

        if meldec_model and os.path.isdir(str(meldec_model)) and (
                Path(meldec_model) / "generator.msgpack").exists():
            from zerovox_tpu.training.checkpointing import load_native_checkpoint

            with open(Path(meldec_model) / "config.json") as f:
                meldec_cfg = HifiGanConfig.from_dict(json.loads(f.read()))
            if verbose:
                print("meldec: native checkpoint: ",
                      Path(meldec_model) / "generator.msgpack")
            gen_params = load_native_checkpoint(
                Path(meldec_model) / "generator.msgpack")["params"]
            mean = np.zeros(meldec_cfg.num_mels, np.float32)
            scale = np.ones(meldec_cfg.num_mels, np.float32)
            return meldec_cfg, {"params": {"generator": gen_params,
                                           "mean": mean, "scale": scale}}

        if meldec_model and os.path.isdir(str(meldec_model)):
            config_path = Path(meldec_model) / "config.json"
            gen_path = Path(meldec_model) / "generator.ckpt"
        elif meldec_model:
            config_path = hub.download_model_file(model=str(meldec_model), relpath="config.json")
            gen_path = hub.download_model_file(model=str(meldec_model), relpath="generator.ckpt")
        else:
            config_path = gen_path = None

        if config_path is not None:
            if verbose:
                print("meldec: using config    : ", config_path)
                print("meldec: using checkpoint: ", gen_path)
            with open(config_path) as f:
                meldec_cfg = HifiGanConfig.from_dict(json.loads(f.read()))
            from zerovox_tpu.checkpoint import load_torch_checkpoint

            sd = load_torch_checkpoint(gen_path)
            gen_params = convert_hifigan_generator(_SD(sd), meldec_cfg)
        elif embedded_state_dict is not None:
            meldec_cfg = HifiGanConfig()
            gen_params = convert_hifigan_generator(_SD(embedded_state_dict), meldec_cfg)
        else:
            raise ValueError("no meldec model specified and none embedded in checkpoint")

        mean = np.zeros(meldec_cfg.num_mels, np.float32)
        scale = np.ones(meldec_cfg.num_mels, np.float32)
        if embedded_state_dict and "mean" in (embedded_state_dict or {}):
            mean = np.asarray(embedded_state_dict["mean"], np.float32)
            scale = np.asarray(embedded_state_dict["scale"], np.float32)
        meldec_vars = {"params": {"generator": gen_params, "mean": mean, "scale": scale}}
        return meldec_cfg, meldec_vars

    @classmethod
    def from_random(cls, cfg: ZeroVoxConfig | None = None,
                    meldec_cfg: HifiGanConfig | None = None,
                    seed: int = 0, language: str = "en", verbose: bool = False,
                    precision: str | None = None,
                    mesh: jax.sharding.Mesh | None = None):
        """Random-initialized engine (benchmarking / tests / offline envs)."""
        cfg = cfg or ZeroVoxConfig()
        meldec_cfg = meldec_cfg or HifiGanConfig(num_mels=cfg.audio.num_mels,
                                                 sampling_rate=cfg.audio.sampling_rate)
        model = ZeroVox(cfg)
        # initialize on CPU — a remote TPU would otherwise run the whole init
        # forward over the wire just to draw random weights. Everything
        # (including the example batch) must be created inside the CPU
        # default-device scope, or device propagation drags init onto the TPU.
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            key = jax.random.PRNGKey(seed)
            batch = {
                "phoneme": jnp.zeros((1, 16), jnp.int32),
                "puncts": jnp.zeros((1, 16), jnp.int32),
                "phoneme_mask": jnp.zeros((1, 16), bool),
                "pitch": jnp.zeros((1, 16)),
                "energy": jnp.zeros((1, 16)),
                "duration": jnp.ones((1, 16), jnp.int32),
                "mel_mask": jnp.zeros((1, 16), bool),
                "ref_mel": jnp.zeros((1, 32, cfg.audio.num_mels)),
            }
            variables = jax.jit(lambda k: model.init({"params": k}, batch, train=False))(key)
            meldec = MelDec(meldec_cfg)
            mdvars = jax.jit(
                lambda k: meldec.init(k, jnp.zeros((1, 16, meldec_cfg.num_mels)),
                                      normalize_before=True)
            )(jax.random.PRNGKey(seed + 1))
            jax.block_until_ready((variables, mdvars))
        return cls(cfg, variables, meldec_cfg, mdvars,
                   language=language, verbose=verbose, precision=precision,
                   mesh=mesh)
