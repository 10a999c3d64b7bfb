"""The composite ZeroVox acoustic model and its training loss.

Wires the zero-shot speaker encoder, the FS2 phoneme encoder / variance
adaptor, and the chosen mel decoder (FFT-block+SCLN or StyleTTS/AdaIN) into
one flax module with multiple entry points (reference zerovox/tts/model.py:158-347):

  * ``__call__``       — training forward: teacher pitch/energy/duration,
                         returns the prediction dict the loss consumes.
  * ``speaker_embed``  — reference-mel -> [B, 1, emb] (run once per voice).
  * ``encode``         — stage A of bucketed inference (text-bucket shaped).
  * ``decode``         — stage B: length-regulate into a static mel bucket and
                         run the mel decoder.

The vocoder (models/hifigan.py MelDec) is deliberately *not* a submodule: it
ships as a separate artifact in the reference's distribution model
(model.py:86-118) and is jitted per mel bucket / streaming chunk separately.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from zerovox_tpu.config import ZeroVoxConfig
from zerovox_tpu.models.fs2 import FS2Decoder, FS2Encoder
from zerovox_tpu.models.resnetse import ResNetSE34V2
from zerovox_tpu.models.styletts import StyleTTSDecoder


class ZeroVox(nn.Module):
    cfg: ZeroVoxConfig

    def setup(self):
        m = self.cfg.model
        self.phoneme_encoder = FS2Encoder(m)
        self.spkemb = ResNetSE34V2(
            layers=tuple(m.resnet.layers),
            num_filters=tuple(m.resnet.num_filters),
            n_out=m.emb_size,
            encoder_type=m.resnet.encoder_type,
            n_mels=self.cfg.audio.num_mels,
            log_input=False,
            remat=m.remat_speaker,
            packed_stages=int(m.packed_speaker),
            fused_stage1=bool(m.fused_speaker),
        )
        if m.decoder.kind == "fastspeech2":
            self.mel_decoder = FS2Decoder(
                dec_cfg=m.decoder, max_mel_len=m.max_mel_len,
                n_mels=self.cfg.audio.num_mels, remat=m.remat,
            )
        elif m.decoder.kind == "styletts":
            self.mel_decoder = StyleTTSDecoder(
                dim_in=m.emb_size, style_dim=m.emb_size,
                residual_dim=64, dim_out=self.cfg.audio.num_mels,
            )
        else:
            raise ValueError(f"unknown decoder kind: '{m.decoder.kind}'")

    # ------------------------------------------------------------- inference

    def speaker_embed(self, ref_mel, train: bool = False):
        """ref_mel [B, T, n_mels] -> [B, 1, emb_size], L2-normalized."""
        return self.spkemb(ref_mel, train=train)

    def encode(self, phonemes, puncts, style_embed, phoneme_mask=None,
               duration_target=None, deterministic: bool = True):
        return self.phoneme_encoder.encode_variance(
            phonemes, puncts, style_embed,
            phoneme_mask=phoneme_mask,
            duration_target=duration_target,
            deterministic=deterministic,
        )

    def decode(self, x, durations, style_embed, max_mel_len: int,
               deterministic: bool = True):
        """Length-regulate into a static `max_mel_len` grid and decode to mel.
        Returns (mel [B, T, n_mels], mel_len [B], mel_mask [B, T])."""
        from zerovox_tpu.ops.length_regulator import length_regulate

        frames, mel_len, mel_mask = length_regulate(x, durations, max_mel_len)
        mel = self.mel_decoder(frames, mel_mask, style_embed, deterministic)
        mel = jnp.where(mel_mask[..., None], 0.0, mel)
        return mel, mel_len, mel_mask

    # -------------------------------------------------------------- training

    def __call__(self, batch: dict[str, Any], train: bool = True,
                 force_duration: bool = False, spkemb_train: bool | None = None):
        """Training/teacher forward (reference model.py:260-293). `batch` uses
        the reference's collate contract: phoneme, puncts, phoneme_mask,
        pitch, energy, duration, mel_mask, ref_mel. `spkemb_train=False` keeps
        the speaker encoder's BatchNorms in eval mode (decoder-only finetune,
        reference utils/train_tts.py:275-276)."""
        # spkemb trains with the rest of the model (reference model.py:263);
        # in train mode its BatchNorms use batch statistics and update the
        # running averages (callers pass mutable=["batch_stats"]).
        spk_train = train if spkemb_train is None else (train and spkemb_train)
        style_embed = self.spkemb(batch["ref_mel"], train=spk_train)

        max_mel_len = batch["mel_mask"].shape[1]
        use_teacher = train or force_duration
        pred = self.phoneme_encoder(
            batch["phoneme"],
            batch["puncts"],
            style_embed,
            max_mel_len=max_mel_len,
            phoneme_mask=batch.get("phoneme_mask"),
            pitch_target=batch["pitch"] if train else None,
            energy_target=batch["energy"] if train else None,
            duration_target=batch["duration"] if use_teacher else None,
            mel_mask=batch.get("mel_mask") if use_teacher else None,
            deterministic=not train,
        )

        mel = self.mel_decoder(pred["features"], pred["mel_mask"], style_embed,
                               deterministic=not train)
        mel = jnp.where(pred["mel_mask"][..., None], 0.0, mel)
        pred["mel"] = mel
        return pred


# ------------------------------------------------------------------- loss


def masked_mean(values: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """Mean over elements where `keep` is True (masked_select semantics)."""
    keep = jnp.broadcast_to(keep, values.shape).astype(values.dtype)
    return jnp.sum(values * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def zerovox_loss(pred: dict[str, Any], batch: dict[str, Any]) -> dict[str, jnp.ndarray]:
    """Reference loss semantics (model.py:353-416): masked L1 on mel, masked
    MSE on pitch/energy/log-duration (targets log(d+1)), combined with weights
    10/2/2/1."""
    mel_keep = ~batch["mel_mask"]  # True at valid frames
    phon_keep = ~batch["phoneme_mask"]

    mel_loss = masked_mean(jnp.abs(pred["mel"] - batch["mel"]), mel_keep[..., None])

    pitch_loss = masked_mean((pred["pitch"] - batch["pitch"]) ** 2, phon_keep)
    energy_loss = masked_mean((pred["energy"] - batch["energy"]) ** 2, phon_keep)

    log_dur_target = jnp.log(batch["duration"].astype(jnp.float32) + 1.0)
    duration_loss = masked_mean((pred["log_duration"] - log_dur_target) ** 2, phon_keep)

    loss = 10.0 * mel_loss + 2.0 * pitch_loss + 2.0 * energy_loss + duration_loss
    return {
        "loss": loss,
        "mel_loss": mel_loss,
        "pitch_loss": pitch_loss,
        "energy_loss": energy_loss,
        "duration_loss": duration_loss,
    }
