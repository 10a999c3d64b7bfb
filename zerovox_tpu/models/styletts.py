"""StyleTTS AdaIN residual-conv mel decoder (alternative to FS2Decoder).

Architecture parity with the reference (zerovox/tts/styletts.py:142-205):
encode = 2x ResBlk1d to 2*dim; decode = 5x AdainResBlk1d conditioned on the
speaker style via AdaIN, with the `asr_res` skip concatenated until the block
flagged `upsample` (which — as in the reference, where the upsampling layers
are commented out — performs no actual upsampling; the flag only stops the
skip concat); out conv -> n_mels.

All convs are weight-normalized as in the reference; the (g, v)
parametrization is kept so training matches, and checkpoint import fills g/v
directly from the torch parametrization.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from zerovox_tpu.models.layers import InstanceNorm, WeightNormConv1d, leaky_relu


class ResBlk1d(nn.Module):
    """(reference styletts.py:11-69); operates on [B, L, C]."""

    dim_in: int
    dim_out: int
    normalize: bool = False
    dropout_p: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        learned_sc = self.dim_in != self.dim_out

        # shortcut
        sc = x
        if learned_sc:
            sc = WeightNormConv1d(self.dim_out, 1, use_bias=False, name="conv1x1")(sc)

        # residual
        h = x
        if self.normalize:
            h = InstanceNorm(self.dim_in, affine=True, name="norm1")(h)
        h = leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout_p, deterministic=deterministic)(h)
        h = WeightNormConv1d(self.dim_in, 3, padding=1, name="conv1")(h)
        if self.normalize:
            h = InstanceNorm(self.dim_in, affine=True, name="norm2")(h)
        h = leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout_p, deterministic=deterministic)(h)
        h = WeightNormConv1d(self.dim_out, 3, padding=1, name="conv2")(h)

        return (sc + h) / math.sqrt(2)


class AdaIN1d(nn.Module):
    """(1 + gamma(s)) * InstanceNorm(x) + beta(s) (reference styletts.py:82-92)."""

    num_features: int

    @nn.compact
    def __call__(self, x, s):  # x: [B, L, C], s: [B, style_dim]
        h = nn.Dense(self.num_features * 2, name="fc")(s)  # [B, 2C]
        gamma, beta = jnp.split(h, 2, axis=-1)
        xn = InstanceNorm(self.num_features, affine=False, name="norm")(x)
        return (1 + gamma[:, None, :]) * xn + beta[:, None, :]


class AdainResBlk1d(nn.Module):
    """(reference styletts.py:95-139). `upsample` performs no resampling in
    the reference (its pool layers are commented out); it only marks where the
    decoder stops concatenating the asr residual."""

    dim_in: int
    dim_out: int
    upsample: bool = False
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x, s, deterministic: bool = True):
        learned_sc = self.dim_in != self.dim_out

        sc = x
        if learned_sc:
            sc = WeightNormConv1d(self.dim_out, 1, use_bias=False, name="conv1x1")(sc)

        h = AdaIN1d(self.dim_in, name="norm1")(x, s)
        h = leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout_p, deterministic=deterministic)(h)
        h = WeightNormConv1d(self.dim_out, 3, padding=1, name="conv1")(h)
        h = AdaIN1d(self.dim_out, name="norm2")(h, s)
        h = leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout_p, deterministic=deterministic)(h)
        h = WeightNormConv1d(self.dim_out, 3, padding=1, name="conv2")(h)

        return (h + sc) / math.sqrt(2)


class StyleTTSDecoder(nn.Module):
    """(reference styletts.py:142-205); same call signature as FS2Decoder."""

    dim_in: int  # acoustic hidden size (528)
    style_dim: int  # speaker embedding size (528)
    residual_dim: int = 64
    dim_out: int = 80

    @nn.compact
    def __call__(self, enc_seq, mel_mask, spk_emb, deterministic: bool = True):
        """enc_seq [B, T, H], spk_emb [B, 1, style_dim] -> mel [B, T, n_mels]."""
        bottleneck = self.dim_in * 2
        s = spk_emb[:, 0, :]  # [B, style]

        x = ResBlk1d(self.dim_in, bottleneck, normalize=True, name="encode_0")(enc_seq, deterministic)
        x = ResBlk1d(bottleneck, bottleneck, normalize=True, name="encode_1")(x, deterministic)

        asr_res = WeightNormConv1d(self.residual_dim, 1, name="asr_res_conv")(enc_seq)
        asr_res = InstanceNorm(self.residual_dim, affine=True, name="asr_res_norm")(asr_res)

        specs = [
            (bottleneck + self.residual_dim, bottleneck, False),
            (bottleneck + self.residual_dim, bottleneck, False),
            (bottleneck + self.residual_dim, self.dim_in, True),
            (self.dim_in, self.dim_in, False),
            (self.dim_in, self.dim_in, False),
        ]
        res = True
        for i, (din, dout, ups) in enumerate(specs):
            if res:
                x = jnp.concatenate([x, asr_res], axis=-1)
            x = AdainResBlk1d(din, dout, upsample=ups, name=f"decode_{i}")(x, s, deterministic)
            if ups:
                res = False

        mel = WeightNormConv1d(self.dim_out, 1, name="to_out")(x)
        return mel
