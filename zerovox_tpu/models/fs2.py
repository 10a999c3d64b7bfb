"""FastSpeech2-style acoustic model: FFT-block encoder, variance adaptor with
static-shape length regulation, and FFT-block mel decoder with
Speaker-Conditional LayerNorm.

Architecture parity with the reference (zerovox/tts/fs2.py): same layer
shapes, same masking discipline (padded positions zeroed after every block so
convolutions see zeros past the sequence end), same variance-bin quantization
— but designed TPU-first: every forward is statically shaped (text/mel length
buckets), the length regulator is a vectorized gather
(zerovox_tpu/ops/length_regulator.py) instead of the reference's Python loop
(fs2.py:403-459), and attention runs as batched einsums on the MXU.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from zerovox_tpu.config import DecoderConfig, EncoderConfig, ModelConfig
from zerovox_tpu.models.layers import SCLN, Conv1d, LayerNorm, get_sinusoid_encoding_table
from zerovox_tpu.ops.length_regulator import length_regulate


def _flash_eligible(seq_len: int) -> bool:
    """Select the attention implementation (ZEROVOX_ATTN=einsum|flash|auto).

    The Pallas flash kernel streams K/V blocks through VMEM with an online
    softmax instead of materializing the [B, h, L, L] f32 score tensor in
    HBM — the textbook win. Measured on a v5e (bf16-mixed train step,
    tts_medium, B=8; docs/PERFORMANCE.md round-3 crossover table) it LOSES
    to the einsum path at every training length: 32.7 vs 30.0 ms at L=768,
    53.7 vs 48.2 at L=1536, 98.2 vs 90.5 at L=2560. Cause: d_k=d_v=48 pads
    to a 128-lane minor dimension inside the kernel (2.7x wasted MXU work
    per tap), while XLA fuses the einsum path's softmax into the score
    matmul well enough that its extra HBM traffic stays under the roofline
    at these sizes. "auto" therefore means einsum; flash remains an
    explicit opt-in for head dims >= 128 or lengths beyond the measured
    range. Kernel precondition: L % 128 == 0 and L >= 256.
    """
    spec = os.environ.get("ZEROVOX_ATTN", "auto")
    if spec != "flash":
        return False
    return seq_len % 128 == 0 and seq_len >= 256


class MultiHeadAttention(nn.Module):
    """Self-attention with optional SCLN conditioning
    (reference fs2.py:108-164). Softmax masking uses -inf like the reference's
    masked_fill; padded query rows stay finite because valid keys remain.
    Long aligned sequences on TPU take the Pallas flash-attention kernel
    (_flash_eligible); both paths produce identical valid-position outputs
    (padded rows are zeroed by the caller)."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    scln: bool
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, spk_emb, attn_mask, deterministic: bool = True,
                 pad_mask=None):
        B, L, _ = x.shape
        residual = x

        q = nn.Dense(self.n_head * self.d_k, name="w_qs")(x)
        k = nn.Dense(self.n_head * self.d_k, name="w_ks")(x)
        v = nn.Dense(self.n_head * self.d_v, name="w_vs")(x)

        q = q.reshape(B, L, self.n_head, self.d_k)
        k = k.reshape(B, L, self.n_head, self.d_k)
        v = v.reshape(B, L, self.n_head, self.d_v)

        # NB: np.sqrt returns a strong-typed f32 scalar that would silently
        # upcast everything.
        scale = 1.0 / float(np.sqrt(self.d_k))

        if (self.d_k == self.d_v and pad_mask is not None
                and _flash_eligible(L)):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention)

            # pad tokens get their own segment: valid queries never see
            # them; pad queries attend pads only (rows zeroed by caller)
            seg = pad_mask.astype(jnp.int32)
            segs = SegmentIds(q=seg, kv=seg)
            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            if self.d_k > 128 and self.d_k % 128:
                # kernel wants head_dim % 128 == 0 when > 128; zero-pad
                # (free — the MXU pads lanes to 128 either way). Zero q/k
                # lanes don't change scores; zero v lanes are sliced off.
                pd = (-self.d_k) % 128
                qh, kh, vh = (jnp.pad(t, ((0, 0),) * 3 + ((0, pd),))
                              for t in (qh, kh, vh))
            # explicit block sizes are LOAD-BEARING: the kernel's default
            # sizing makes the dk/dv backward kernel hang at runtime on
            # v5e (isolated on hardware: grad-q-only runs, full grads
            # never return; 256/128 blocks run fine). Blocks must divide
            # L, which is always a multiple of 128 here (_flash_eligible).
            blk = 256 if L % 256 == 0 else 128
            bs = BlockSizes(
                block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                block_q_major_dkv=blk, block_k_major_dkv=blk,
                block_k_dkv=blk, block_q_dkv=blk,
                block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
            o = flash_attention(qh, kh, vh, segment_ids=segs, sm_scale=scale,
                                block_sizes=bs)
            o = o[..., : self.d_v]
            out = o.transpose(0, 2, 1, 3).reshape(B, L, self.n_head * self.d_v)
            out = out.astype(x.dtype)
        else:
            # [B, h, Lq, Lk]; scores + softmax in f32 (torch-autocast
            # semantics — bf16 softmax is numerically fragile), weights cast
            # back so mixed precision keeps the matmuls in bf16.
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                              preferred_element_type=jnp.float32) * scale
            if attn_mask is not None:
                attn = jnp.where(attn_mask[:, None, :, :], -jnp.inf, attn)
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn,
                             v).reshape(B, L, self.n_head * self.d_v)
        out = nn.Dense(self.d_model, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)

        if self.scln:
            out = SCLN(self.d_model, name="layer_norm")(out + residual, spk_emb)
        else:
            out = LayerNorm(self.d_model, name="layer_norm")(out + residual)
        return out


class PositionwiseFeedForward(nn.Module):
    """Two-conv FFN (k=9 then k=1) with residual + (SC)LN
    (reference fs2.py:166-209)."""

    d_in: int
    d_hid: int
    kernel_size: tuple[int, int]
    scln: bool
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, spk_emb, deterministic: bool = True):
        residual = x
        out = Conv1d(self.d_hid, self.kernel_size[0], padding=(self.kernel_size[0] - 1) // 2, name="w_1")(x)
        out = jax.nn.relu(out)
        out = Conv1d(self.d_in, self.kernel_size[1], padding=(self.kernel_size[1] - 1) // 2, name="w_2")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        if self.scln:
            out = SCLN(self.d_in, name="layer_norm")(out + residual, spk_emb)
        else:
            out = LayerNorm(self.d_in, name="layer_norm")(out + residual)
        return out


class FFTBlock(nn.Module):
    """MHA + FFN, each followed by zeroing of padded positions
    (reference fs2.py:211-230)."""

    d_model: int
    n_head: int
    d_k: int
    d_v: int
    d_inner: int
    kernel_size: tuple[int, int]
    scln: bool
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, spk_emb, pad_mask, attn_mask, deterministic: bool = True):
        out = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v, scln=self.scln,
            dropout=self.dropout, name="slf_attn",
        )(x, spk_emb, attn_mask, deterministic, pad_mask=pad_mask)
        out = jnp.where(pad_mask[..., None], 0.0, out)

        out = PositionwiseFeedForward(
            self.d_model, self.d_inner, self.kernel_size, scln=self.scln,
            dropout=self.dropout, name="pos_ffn",
        )(out, spk_emb, deterministic)
        out = jnp.where(pad_mask[..., None], 0.0, out)
        return out


def _position_table(seq_len: int, trained_len: int, d_model: int) -> jnp.ndarray:
    """Positional encodings for a static bucket length; regenerated on the fly
    when the bucket exceeds the trained table (reference fs2.py:287-294,
    383-388 — here it is free because lengths are static)."""
    n = max(seq_len, 1)
    if seq_len > trained_len:
        table = get_sinusoid_encoding_table(n, d_model)
    else:
        table = get_sinusoid_encoding_table(trained_len + 1, d_model)[:seq_len]
    return jnp.asarray(table)


class Encoder(nn.Module):
    """Phone + punctuation embedding -> positions -> N FFT blocks, no SCLN
    (reference fs2.py:317-401)."""

    num_phones: int
    num_puncts: int
    embed_dim: int
    punct_embed_dim: int
    n_layers: int
    n_head: int
    conv_filter_size: int
    conv_kernel_size: tuple[int, int]
    dropout: float
    max_txt_len: int
    remat: bool = False

    @nn.compact
    def __call__(self, phonemes, puncts, pad_mask, deterministic: bool = True):
        B, L = phonemes.shape
        d_model = self.embed_dim + self.punct_embed_dim
        d_k = d_v = d_model // self.n_head

        emb = nn.Embed(self.num_phones + 1, self.embed_dim, name="src_word_emb")(phonemes)
        # torch padding_idx=0: row 0 frozen at zero
        emb = jnp.where((phonemes == 0)[..., None], 0.0, emb)
        if self.punct_embed_dim > 0:
            pemb = nn.Embed(self.num_puncts + 1, self.punct_embed_dim, name="punct_embed")(puncts)
            pemb = jnp.where((puncts == 0)[..., None], 0.0, pemb)
            x = jnp.concatenate([emb, pemb], axis=-1)
        else:
            # punct_emb_dim: 0 — fold punctuation ADDITIVELY into the phone
            # embedding so d_model == embed_dim stays a multiple of the
            # 128-lane MXU width (512 vs the concat path's 528, which pads
            # every matmul to 640 = 17.5% wasted tiles). New-training
            # option; reference-config checkpoints keep the concat layout.
            pemb = nn.Embed(self.num_puncts + 1, self.embed_dim, name="punct_embed")(puncts)
            x = emb + jnp.where((puncts == 0)[..., None], 0.0, pemb)

        # cast to x's dtype: an f32 table would silently upcast every
        # downstream FFT block out of bf16 in mixed-precision mode
        x = x + _position_table(L, self.max_txt_len, d_model)[None, :, :].astype(x.dtype)

        attn_mask = jnp.broadcast_to(pad_mask[:, None, :], (B, L, L))
        # nn.remat keeps the param tree identical; __call__ arg 5
        # (deterministic, scope is arg 0) must be static for dropout
        block_cls = nn.remat(FFTBlock, static_argnums=(5,)) if self.remat else FFTBlock
        for i in range(self.n_layers):
            x = block_cls(
                d_model, self.n_head, d_k, d_v, self.conv_filter_size,
                self.conv_kernel_size, scln=False, dropout=self.dropout,
                name=f"layer_{i}",
            )(x, None, pad_mask, attn_mask, deterministic)
        return x


class VariancePredictor(nn.Module):
    """Duration/pitch/energy predictor (reference fs2.py:506-563)."""

    filter_size: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        out = Conv1d(self.filter_size, self.kernel_size, padding=(self.kernel_size - 1) // 2, name="conv1d_1")(x)
        out = jax.nn.relu(out)
        out = LayerNorm(self.filter_size, name="layer_norm_1")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        # reference quirk: conv1d_2 uses padding=1 regardless of kernel size
        out = Conv1d(self.filter_size, self.kernel_size, padding=1, name="conv1d_2")(out)
        out = jax.nn.relu(out)
        out = LayerNorm(self.filter_size, name="layer_norm_2")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        out = nn.Dense(1, name="linear_layer")(out)[..., 0]
        if pad_mask is not None:
            out = jnp.where(pad_mask, 0.0, out)
        return out


class VarianceAdaptor(nn.Module):
    """Duration/pitch/energy adaptation + static length regulation
    (reference fs2.py:575-693). Pitch embedding is added *before* the energy
    predictor runs, matching the reference's sequencing."""

    emb_size: int
    vp_filter_size: int
    vp_kernel_size: int
    vp_dropout: float
    ve_n_bins: int

    def setup(self):
        self.duration_predictor = VariancePredictor(self.vp_filter_size, self.vp_kernel_size, self.vp_dropout)
        self.pitch_predictor = VariancePredictor(self.vp_filter_size, self.vp_kernel_size, self.vp_dropout)
        self.energy_predictor = VariancePredictor(self.vp_filter_size, self.vp_kernel_size, self.vp_dropout)
        self.pitch_embedding = nn.Embed(self.ve_n_bins, self.emb_size)
        self.energy_embedding = nn.Embed(self.ve_n_bins, self.emb_size)

    def _bins(self, value):
        idx = jnp.round(value * (self.ve_n_bins - 1)).astype(jnp.int32)
        return jnp.clip(idx, 0, self.ve_n_bins - 1)

    def variance_embed(
        self,
        x,
        src_mask,
        pitch_target=None,
        energy_target=None,
        duration_target=None,
        deterministic: bool = True,
    ):
        """Predictors + pitch/energy embedding addition + duration rounding —
        everything *before* length regulation. Split out so bucketed inference
        can pick the mel-length bucket on the host between the two stages."""
        log_duration_prediction = self.duration_predictor(x, src_mask, deterministic)

        pitch_prediction = self.pitch_predictor(x, src_mask, deterministic)
        pitch_src = pitch_target if pitch_target is not None else pitch_prediction
        x = x + self.pitch_embedding(self._bins(pitch_src))

        energy_prediction = self.energy_predictor(x, src_mask, deterministic)
        energy_src = energy_target if energy_target is not None else energy_prediction
        x = x + self.energy_embedding(self._bins(energy_src))

        if duration_target is not None:
            duration_rounded = duration_target.astype(jnp.int32)
        else:
            duration_rounded = jnp.maximum(
                jnp.round(jnp.exp(log_duration_prediction) - 1.0), 0.0
            ).astype(jnp.int32)
            # padded phones predict log-dur 0 -> exp(0)-1 = 0, but guard anyway
            duration_rounded = jnp.where(src_mask, 0, duration_rounded)

        return {
            "x": x,
            "pitch": pitch_prediction,
            "energy": energy_prediction,
            "log_duration": log_duration_prediction,
            "duration_rounded": duration_rounded,
        }

    def __call__(
        self,
        x,
        src_mask,
        max_mel_len: int,
        pitch_target=None,
        energy_target=None,
        duration_target=None,
        mel_mask=None,
        deterministic: bool = True,
    ):
        va = self.variance_embed(
            x, src_mask,
            pitch_target=pitch_target,
            energy_target=energy_target,
            duration_target=duration_target,
            deterministic=deterministic,
        )

        frames, mel_len, lr_mask = length_regulate(va["x"], va["duration_rounded"], max_mel_len)
        if mel_mask is None:
            mel_mask = lr_mask

        return {
            "features": frames,
            "pitch": va["pitch"],
            "energy": va["energy"],
            "log_duration": va["log_duration"],
            "duration_rounded": va["duration_rounded"],
            "mel_len": mel_len,
            "mel_mask": mel_mask,
        }


class FS2Encoder(nn.Module):
    """Encoder + speaker-embedding broadcast + variance adaptor
    (reference fs2.py:697-775)."""

    model_cfg: ModelConfig

    def setup(self):
        from zerovox_tpu.symbols import Symbols

        syms = Symbols(self.model_cfg.phones, self.model_cfg.puncts)
        enc: EncoderConfig = self.model_cfg.encoder
        self.encoder = Encoder(
            num_phones=syms.num_phones,
            num_puncts=syms.num_puncts,
            embed_dim=self.model_cfg.emb_dim,
            punct_embed_dim=self.model_cfg.punct_emb_dim,
            n_layers=enc.fs2_layer,
            n_head=enc.fs2_head,
            conv_filter_size=self.model_cfg.decoder.conv_filter_size,
            conv_kernel_size=tuple(self.model_cfg.decoder.conv_kernel_size),
            dropout=enc.fs2_dropout,
            max_txt_len=self.model_cfg.max_txt_len,
            remat=self.model_cfg.remat,
        )
        self.variance_adaptor = VarianceAdaptor(
            emb_size=self.model_cfg.emb_size,
            vp_filter_size=enc.vp_filter_size,
            vp_kernel_size=enc.vp_kernel_size,
            vp_dropout=enc.vp_dropout,
            ve_n_bins=enc.ve_n_bins,
        )

    def encode_variance(
        self,
        phonemes,
        puncts,
        style_embed,
        phoneme_mask=None,
        pitch_target=None,
        energy_target=None,
        duration_target=None,
        deterministic: bool = True,
    ):
        """Stage A of bucketed inference: everything up to (but excluding)
        length regulation; output shape depends only on the text bucket."""
        if phoneme_mask is None:
            phoneme_mask = jnp.zeros_like(phonemes, dtype=bool)

        features = self.encoder(phonemes, puncts, phoneme_mask, deterministic)
        features = features + style_embed  # [B,1,H] broadcast (fs2.py:740-741)

        return self.variance_adaptor.variance_embed(
            features,
            phoneme_mask,
            pitch_target=pitch_target,
            energy_target=energy_target,
            duration_target=duration_target,
            deterministic=deterministic,
        )

    def __call__(
        self,
        phonemes,
        puncts,
        style_embed,
        max_mel_len: int,
        phoneme_mask=None,
        pitch_target=None,
        energy_target=None,
        duration_target=None,
        mel_mask=None,
        deterministic: bool = True,
    ):
        if phoneme_mask is None:
            phoneme_mask = jnp.zeros_like(phonemes, dtype=bool)

        features = self.encoder(phonemes, puncts, phoneme_mask, deterministic)
        features = features + style_embed  # [B,1,H] broadcast (fs2.py:740-741)

        return self.variance_adaptor(
            features,
            phoneme_mask,
            max_mel_len,
            pitch_target=pitch_target,
            energy_target=energy_target,
            duration_target=duration_target,
            mel_mask=mel_mask,
            deterministic=deterministic,
        )


class FS2Decoder(nn.Module):
    """Mel decoder: positions + N FFT blocks with SCLN + linear head
    (reference fs2.py:232-315)."""

    dec_cfg: DecoderConfig
    max_mel_len: int
    n_mels: int
    remat: bool = False

    @nn.compact
    def __call__(self, x, mel_mask, spk_emb, deterministic: bool = True):
        B, T, d_model = x.shape
        cfg = self.dec_cfg
        d_k = d_v = d_model // cfg.n_head

        x = x + _position_table(T, self.max_mel_len, d_model)[None, :, :].astype(x.dtype)

        attn_mask = jnp.broadcast_to(mel_mask[:, None, :], (B, T, T))
        block_cls = nn.remat(FFTBlock, static_argnums=(5,)) if self.remat else FFTBlock
        for i in range(cfg.n_layers):
            x = block_cls(
                d_model, cfg.n_head, d_k, d_v, cfg.conv_filter_size,
                tuple(cfg.conv_kernel_size), scln=cfg.scln, dropout=cfg.dropout,
                name=f"layer_{i}",
            )(x, spk_emb, mel_mask, attn_mask, deterministic)

        mel = nn.Dense(self.n_mels, name="mel_linear")(x)
        return mel
