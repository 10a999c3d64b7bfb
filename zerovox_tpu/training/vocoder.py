"""HiFi-GAN adversarial vocoder training (VERDICT r4 task #2).

The reference repo never trains its vocoder: `utils/export_hifigan.py:37-171`
exports a (ground-truth wav | teacher-aligned mel) corpus for an EXTERNAL
ParallelWaveGAN/HiFi-GAN repo to consume. This module closes that loop
in-repo: the generator, MPD/MSD discriminators, and the LSGAN / feature /
mel losses (zerovox_tpu/models/hifigan.py, parity-tested against reference
zerovox/tts/hifigan.py:142-296) are driven by a jitted two-optimizer GAN
step on the TPU.

TPU-first notes:
  * one jitted step updates BOTH optimizers (discriminator first on the
    detached fake, then the generator against the updated discriminators —
    the upstream HiFi-GAN schedule) so the whole GAN round is a single XLA
    program: no host round-trip between D and G, and the second generator
    forward (needed for generator grads) fuses into the same program;
  * the mel-spectrogram loss re-runs the jitted STFT/log-mel frontend
    (zerovox_tpu/dsp/mels.py) INSIDE the step — mel extraction is just
    rfft + matmul, so XLA keeps it on-device instead of a host feature
    pipeline;
  * fixed segment length (default 32 mel frames = 8192 samples at hop 256)
    keeps every step the same XLA program; batches shard over the mesh
    `data` axis exactly like the TTS step (parallel/mesh.py);
  * unlike torch HiFi-GAN there is no weight_norm reparameterization: the
    inference generator folds weight norm at import, so training plain
    convs keeps the param tree byte-compatible with the rest of the stack
    (checkpoints drop into `ZeroVoxTTS._load_meldec` / streaming / serving
    unchanged).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from zerovox_tpu.models.hifigan import (
    Generator,
    HifiGanConfig,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)

# ----------------------------------------------------------------- data


@dataclass
class VocoderDataConfig:
    sampling_rate: int = 22050
    fft_size: int = 1024
    hop_size: int = 256
    win_length: int = 1024
    num_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = 8000.0
    segment_frames: int = 32  # 32 * 256 = 8192 samples, upstream default


class VocoderDataset:
    """Random fixed-length (mel, wav) segment sampler over preprocessed
    corpora.

    Two on-disk contracts are accepted:
      * a preprocess output dir (`train.txt` + `wavs/` + `mel/` +
        `mel/startstop-*.json`): mel frame t of `mel-{base}.npy` covers
        wav[(start_hop + t) * hop : +hop] of `wavs/{base}.wav` — the same
        arithmetic `cli/export_hifigan.py` uses (reference
        utils/export_hifigan.py:117-128);
      * an export dir of `*.h5` files with `feats` + `wave` datasets (the
        exact corpus `cli/export_hifigan.py --orig` writes, i.e. what the
        reference hands to its external vocoder repo).

    The real-speech corpus is ~10 minutes, so everything is preloaded to
    host RAM; items shorter than the segment are zero-padded on the right
    (mel floor-padded) rather than dropped.
    """

    def __init__(self, dirs: list[str], cfg: VocoderDataConfig,
                 seed: int = 0):
        self.cfg = cfg
        self.items: list[tuple[np.ndarray, np.ndarray]] = []  # (mel[T,M], wav[T*hop])
        for d in dirs:
            if os.path.exists(os.path.join(d, "train.txt")):
                self._load_pp_dir(d)
            else:
                self._load_h5_dir(d)
        if not self.items:
            raise ValueError(f"no usable (mel, wav) items under {dirs}")
        self._rng = np.random.default_rng(seed)
        self._dev = None  # populated by device_batches
        self._cut = None

    def _add(self, mel: np.ndarray, wav: np.ndarray) -> None:
        hop, F = self.cfg.hop_size, self.cfg.segment_frames
        T = min(mel.shape[0], len(wav) // hop)
        if T < 2:
            return
        mel, wav = mel[:T], wav[: T * hop]
        if T < F:  # pad short items up to one segment
            mel = np.pad(mel, ((0, F - T), (0, 0)), mode="edge")
            wav = np.pad(wav, (0, (F - T) * hop))
        self.items.append((mel.astype(np.float32), wav.astype(np.float32)))

    def _load_pp_dir(self, d: str) -> None:
        from zerovox_tpu.dsp.audio import load_wav

        hop = self.cfg.hop_size
        with open(os.path.join(d, "train.txt")) as f:
            for line in f:
                wavname = line.strip().split("|")[0]
                base = os.path.splitext(wavname)[0]
                mel_p = os.path.join(d, "mel", f"mel-{base}.npy")
                ss_p = os.path.join(d, "mel", f"startstop-{base}.json")
                wav_p = os.path.join(d, "wavs", wavname)
                if not (os.path.exists(mel_p) and os.path.exists(wav_p)):
                    continue
                mel = np.load(mel_p)  # [T, n_mels]
                start_hop = 0
                if os.path.exists(ss_p):
                    with open(ss_p) as sf:
                        start_hop = int(json.load(sf)["start_hop"])
                wav, _ = load_wav(wav_p, target_sr=self.cfg.sampling_rate)
                self._add(mel, wav[start_hop * hop:])

    def _load_h5_dir(self, d: str) -> None:
        import glob

        import h5py

        for p in sorted(glob.glob(os.path.join(d, "**", "*.h5"),
                                  recursive=True)):
            with h5py.File(p, "r") as h:
                self._add(np.asarray(h["feats"]), np.asarray(h["wave"]))

    def __len__(self) -> int:
        return len(self.items)

    def _epoch_plan(self, batch_size: int) -> Iterator[tuple]:
        """Shared rng stream for both loader modes: one (item-index,
        segment-offset) plan per batch. Host and device assembly of the
        same plan yield bit-identical batches."""
        F = self.cfg.segment_frames
        order = self._rng.permutation(len(self.items))
        for b0 in range(0, len(order), batch_size):
            idx = order[b0 : b0 + batch_size]
            if len(idx) < batch_size:  # wrap
                idx = np.concatenate(
                    [idx, order[: batch_size - len(idx)]])
            t0s = np.asarray(
                [int(self._rng.integers(0, self.items[int(i)][0].shape[0] - F + 1))
                 for i in idx], np.int32)
            yield np.asarray(idx, np.int32), t0s

    def batches(self, batch_size: int) -> Iterator[dict]:
        """One epoch: every item sampled once (shuffled), random segment
        offset per draw; the tail batch wraps (same policy as the TTS
        loader's wrap-padded export batches)."""
        F, hop = self.cfg.segment_frames, self.cfg.hop_size
        for idx, t0s in self._epoch_plan(batch_size):
            mels = np.empty((batch_size, F, self.cfg.num_mels), np.float32)
            wavs = np.empty((batch_size, F * hop), np.float32)
            for j, (i, t0) in enumerate(zip(idx, t0s)):
                mel, wav = self.items[int(i)]
                t0 = int(t0)
                mels[j] = mel[t0 : t0 + F]
                wavs[j] = wav[t0 * hop : (t0 + F) * hop]
            yield {"mel": mels, "wav": wavs}

    def cache_nbytes(self) -> int:
        tmax = max(mel.shape[0] for mel, _ in self.items)
        return len(self.items) * tmax * 4 * (self.cfg.num_mels
                                             + self.cfg.hop_size)

    def device_batches(self, batch_size: int) -> Iterator[dict]:
        """Device-cached twin of `batches`: the whole (mel, wav) corpus is
        shipped to HBM once and each step's segments are cut on device
        from a host transfer of just the (index, offset) plan — the same
        per-step-device_put fix as the TTS loader's _DeviceCorpusCache
        (docs/PERFORMANCE.md round 5). Bit-identical to `batches` (shared
        `_epoch_plan` rng stream)."""
        if self._dev is None:
            import jax

            hop = self.cfg.hop_size
            n = len(self.items)
            tmax = max(mel.shape[0] for mel, _ in self.items)
            mels = np.zeros((n, tmax, self.cfg.num_mels), np.float32)
            wavs = np.zeros((n, tmax * hop), np.float32)
            for i, (mel, wav) in enumerate(self.items):
                mels[i, : mel.shape[0]] = mel
                wavs[i, : len(wav)] = wav
            self._dev = {"mel": jax.device_put(mels),
                         "wav": jax.device_put(wavs)}

            F = self.cfg.segment_frames

            def _cut(data, idx, t0s):
                import jax.numpy as jnp  # noqa: F401

                def one(m, w, t0):
                    return (jax.lax.dynamic_slice(
                                m, (t0, 0), (F, self.cfg.num_mels)),
                            jax.lax.dynamic_slice(
                                w, (t0 * hop,), (F * hop,)))

                m, w = jax.vmap(one)(data["mel"][idx], data["wav"][idx], t0s)
                return {"mel": m, "wav": w}

            self._cut = jax.jit(_cut)
            print(f"vocoder device cache: {n} items, "
                  f"{(mels.nbytes + wavs.nbytes) / 1e6:.1f} MB on device")
        for idx, t0s in self._epoch_plan(batch_size):
            yield self._cut(self._dev, idx, t0s)


# ------------------------------------------------------- jitted mel loss


def make_batched_logmel(cfg: VocoderDataConfig) -> Callable:
    """wav [B, T] -> log-mel [B, T/hop, n_mels], the same padding/window/
    filterbank contract as the training features (dsp/mels.py, reference
    zerovox/tts/mels.py:357-395) so the mel L1 compares like with like.

    Traced inside the train step: reflect pad + frame + rfft + matmul all
    stay on-device.
    """
    from zerovox_tpu.dsp.mels import hann_window, mel_filterbank

    fft, hop, win = cfg.fft_size, cfg.hop_size, cfg.win_length
    basis = jnp.asarray(mel_filterbank(cfg.sampling_rate, fft, cfg.num_mels,
                                       cfg.fmin, cfg.fmax))  # [M, fft//2+1]
    w = hann_window(win)
    if win < fft:
        lp = (fft - win) // 2
        w = np.pad(w, (lp, fft - win - lp))
    window = jnp.asarray(w)
    pad = (fft - hop) // 2

    def logmel(y: jnp.ndarray) -> jnp.ndarray:
        yp = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (yp.shape[1] - fft) // hop
        idx = (jnp.arange(n_frames) * hop)[:, None] + jnp.arange(fft)[None, :]
        frames = yp[:, idx] * window  # [B, F, fft]
        mags = jnp.abs(jnp.fft.rfft(frames, n=fft, axis=-1))
        return jnp.log(jnp.clip(mags @ basis.T, min=1e-5))

    return logmel


# ------------------------------------------------------------ train step


class VocoderTrainState(struct.PyTreeNode):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def make_vocoder_step(
    gen: Generator,
    mpd: MultiPeriodDiscriminator,
    msd: MultiScaleDiscriminator,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    logmel: Callable,
    mel_weight: float = 45.0,
    precision: str = "32",
    jit: bool = True,
    split: bool = False,
) -> Callable:
    """One GAN round (upstream HiFi-GAN train.py order): D step on the
    detached fake, then G step (adv + 2*feature-matching + 45*mel L1)
    against the UPDATED discriminators. Everything in one XLA program.

    split=True lowers the round as TWO jitted programs (D update, then G
    update) with identical math and update order. Use when the fused
    program is too large for the backend's compiler: the tunneled v5e's
    remote compile dies on the fused G+MPD+MSD fwd+bwd graph at B=16
    ("response body closed", the same failure mode as the B=256 TTS step
    — docs/PERFORMANCE.md round 5), while each half compiles fine.

    precision="bf16-mixed" runs both nets' forwards in bfloat16 with f32
    master weights; every loss is reduced in f32.
    """
    mixed = precision in ("bf16-mixed", "bf16", "16-mixed")

    def _half(tree):
        if not mixed:
            return tree
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def _f32(x):
        return x.astype(jnp.float32)

    def _d_update(state: VocoderTrainState, cy, y_hat):
        """Discriminator update against a constant fake; shared by the
        fused and split lowerings (identical math either way)."""

        def d_loss_fn(d_params):
            dp = _half(d_params)
            rf, gf, _, _ = mpd.apply({"params": dp["mpd"]}, cy, y_hat)
            lf, _, _ = discriminator_loss([_f32(r) for r in rf],
                                          [_f32(g) for g in gf])
            rs, gs, _, _ = msd.apply({"params": dp["msd"]}, cy, y_hat)
            ls, _, _ = discriminator_loss([_f32(r) for r in rs],
                                          [_f32(g) for g in gs])
            return lf + ls, {"d_mpd": lf, "d_msd": ls}

        d_grads, d_aux = jax.grad(d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = tx_d.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        d_aux = {**d_aux, "d_total": d_aux["d_mpd"] + d_aux["d_msd"]}
        return state.replace(d_params=d_params, d_opt=d_opt), d_aux

    def _g_update(state: VocoderTrainState, mel, cmel, cy):
        """Generator update against the (already updated) discriminators."""
        dp = _half(state.d_params)

        def g_loss_fn(g_params):
            y_g = gen.apply({"params": _half(g_params)}, cmel)
            l_mel = jnp.mean(jnp.abs(logmel(_f32(y_g)) - mel)) * mel_weight
            rf, gf, fr, fg = mpd.apply({"params": dp["mpd"]}, cy, y_g)
            rs, gs, sr, sg = msd.apply({"params": dp["msd"]}, cy, y_g)
            l_fm = _f32(feature_loss(fr, fg)) + _f32(feature_loss(sr, sg))
            l_adv_f, _ = generator_loss([_f32(g) for g in gf])
            l_adv_s, _ = generator_loss([_f32(g) for g in gs])
            loss = l_adv_f + l_adv_s + l_fm + l_mel
            return loss, {"g_total": loss, "g_mel": l_mel, "g_fm": l_fm,
                          "g_adv": l_adv_f + l_adv_s}

        g_grads, g_aux = jax.grad(g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = tx_g.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        return state.replace(g_params=g_params, g_opt=g_opt,
                             step=state.step + 1), g_aux

    if split:
        def d_step(state: VocoderTrainState, batch: dict):
            cmel, cy = _half(batch["mel"]), _half(batch["wav"])
            y_hat = gen.apply({"params": _half(state.g_params)}, cmel)
            return _d_update(state, cy, y_hat)

        def g_step(state: VocoderTrainState, batch: dict):
            mel = batch["mel"]
            return _g_update(state, mel, _half(mel), _half(batch["wav"]))

        if jit:
            d_step = jax.jit(d_step, donate_argnums=(0,))
            g_step = jax.jit(g_step, donate_argnums=(0,))

        def step2(state: VocoderTrainState, batch: dict):
            state, d_aux = d_step(state, batch)
            state, g_aux = g_step(state, batch)
            return state, {**d_aux, **g_aux}

        step2.parts = (d_step, g_step)
        return step2

    def step(state: VocoderTrainState, batch: dict):
        mel, y = batch["mel"], batch["wav"]
        cmel, cy = _half(mel), _half(y)
        # D update on the detached fake, then G against the updated D
        y_hat = gen.apply({"params": _half(state.g_params)}, cmel)
        state, d_aux = _d_update(state, cy, y_hat)
        state, g_aux = _g_update(state, mel, cmel, cy)
        return state, {**d_aux, **g_aux}

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,))


# --------------------------------------------------------------- trainer


@dataclass
class VocoderTrainerConfig:
    max_epochs: int = 100
    batch_size: int = 16
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999  # per epoch, upstream HiFi-GAN ExponentialLR
    out_folder: str = "myvocoder1"
    precision: str = "32"
    log_every_n_epochs: int = 1
    checkpoint_every_n_epochs: int = 25
    mel_weight: float = 45.0
    seed: int = 42
    # test-size discriminator variants (full reference sizes by default)
    mpd_periods: tuple[int, ...] = (2, 3, 5, 7, 11)
    msd_scales: int = 3
    # device-resident (mel, wav) corpus (VocoderDataset.device_batches)
    device_cache: bool = True
    device_cache_limit: int = 2 << 30
    # lower the GAN round as two XLA programs (make_vocoder_step split=True)
    split_step: bool = False


class VocoderTrainer:
    """Epoch-driven GAN trainer; checkpoints drop into the inference stack
    (`generator.msgpack` + `config.json` load via ZeroVoxTTS._load_meldec,
    so a trained vocoder serves/streams like an imported torch one)."""

    def __init__(self, gcfg: HifiGanConfig, dcfg: VocoderDataConfig,
                 tcfg: VocoderTrainerConfig, steps_per_epoch: int, mesh=None):
        from zerovox_tpu.parallel.mesh import make_mesh

        self.gcfg, self.dcfg, self.tcfg = gcfg, dcfg, tcfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.gen = Generator(gcfg)
        self.mpd = MultiPeriodDiscriminator(periods=tcfg.mpd_periods)
        self.msd = MultiScaleDiscriminator(num_scales=tcfg.msd_scales)
        sched = optax.exponential_decay(
            tcfg.learning_rate, transition_steps=max(steps_per_epoch, 1),
            decay_rate=tcfg.lr_decay, staircase=True)
        self.tx_g = optax.adamw(sched, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                                weight_decay=0.01)
        self.tx_d = optax.adamw(sched, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                                weight_decay=0.01)
        self._logmel = make_batched_logmel(dcfg)
        self._step = make_vocoder_step(
            self.gen, self.mpd, self.msd, self.tx_g, self.tx_d,
            self._logmel, mel_weight=tcfg.mel_weight,
            precision=tcfg.precision, split=tcfg.split_step)

    def init_state(self, rng: jax.Array | None = None) -> VocoderTrainState:
        from zerovox_tpu.parallel.mesh import replicate

        rng = rng if rng is not None else jax.random.PRNGKey(self.tcfg.seed)
        F, hop = self.dcfg.segment_frames, self.dcfg.hop_size
        mel0 = jnp.zeros((1, F, self.dcfg.num_mels), jnp.float32)
        wav0 = jnp.zeros((1, F * hop), jnp.float32)
        kg, kp, ks = jax.random.split(rng, 3)
        g_params = self.gen.init(kg, mel0)["params"]
        d_params = {
            "mpd": self.mpd.init(kp, wav0, wav0)["params"],
            "msd": self.msd.init(ks, wav0, wav0)["params"],
        }
        state = VocoderTrainState(
            g_params=g_params, d_params=d_params,
            g_opt=self.tx_g.init(g_params), d_opt=self.tx_d.init(d_params),
            step=jnp.zeros((), jnp.int32))
        return replicate(state, self.mesh)

    # ----------------------------------------------------------- persist

    def save_generator(self, state: VocoderTrainState, out_dir: str) -> str:
        """Write the inference contract: config.json + generator.msgpack
        (native twin of the reference meldec dir, model.py:86-118)."""
        from zerovox_tpu.training.checkpointing import save_native_checkpoint

        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(asdict(self.gcfg), f, indent=1)
        path = os.path.join(out_dir, "generator.msgpack")
        save_native_checkpoint(
            path, {"params": jax.device_get(state.g_params)},
            meta={"step": int(jax.device_get(state.step))})
        return path

    def save_state(self, state: VocoderTrainState, out_dir: str,
                   epoch: int) -> str:
        """Full-state (both nets + both optimizers) resume checkpoint."""
        from flax import serialization

        ckpt_dir = os.path.join(out_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, f"vocoder-{epoch:04d}.msgpack")
        blob = serialization.to_bytes(jax.device_get(state))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        with open(path + ".json", "w") as f:
            json.dump({"epoch": epoch}, f)
        return path

    def restore_state(self, state: VocoderTrainState,
                      path: str) -> VocoderTrainState:
        from flax import serialization

        from zerovox_tpu.parallel.mesh import replicate

        with open(path, "rb") as f:
            restored = serialization.from_bytes(jax.device_get(state),
                                                f.read())
        return replicate(restored, self.mesh)

    # --------------------------------------------------------------- fit

    def fit(self, dataset: VocoderDataset,
            state: VocoderTrainState) -> VocoderTrainState:
        from zerovox_tpu.parallel.mesh import shard_batch

        tcfg = self.tcfg
        # device-resident corpus unless it would crowd HBM or the run is
        # multi-process (process-local host shards)
        use_cache = (tcfg.device_cache
                     and jax.process_count() == 1
                     and dataset.cache_nbytes() <= tcfg.device_cache_limit)
        loader = (dataset.device_batches if use_cache else dataset.batches)
        os.makedirs(tcfg.out_folder, exist_ok=True)
        t0 = time.time()
        history: list[dict] = []
        for epoch in range(tcfg.max_epochs):
            losses = None
            for batch in loader(tcfg.batch_size):
                state, losses = self._step(state, shard_batch(batch, self.mesh))
            if losses is not None and (
                    epoch % tcfg.log_every_n_epochs == 0
                    or epoch == tcfg.max_epochs - 1):
                host = {k: float(v) for k, v in
                        jax.device_get(losses).items()}
                history.append({"epoch": epoch, **host})
                print(f"epoch {epoch}: g_total={host['g_total']:.3f} "
                      f"g_mel={host['g_mel']:.3f} g_adv={host['g_adv']:.3f} "
                      f"g_fm={host['g_fm']:.3f} d_total={host['d_total']:.3f}"
                      f" ({time.time() - t0:.0f}s)", flush=True)
            if ((epoch + 1) % tcfg.checkpoint_every_n_epochs == 0
                    or epoch == tcfg.max_epochs - 1):
                self.save_state(state, tcfg.out_folder, epoch)
                self.save_generator(state, tcfg.out_folder)
        with open(os.path.join(tcfg.out_folder, "losses.json"), "w") as f:
            json.dump(history, f, indent=1)
        return state
