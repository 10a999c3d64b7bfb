"""ResNetSE34V2 zero-shot speaker encoder.

Architecture parity with the reference (zerovox/tts/ResNetSE34V2.py:101-212):
log-mel [B, T, n_mels] -> per-mel-bin instance norm -> Conv2d stem -> four
SE-ResNet stages (strides 1,2,2,2) -> attentive statistics pooling (ASP: att-
weighted mean ++ std) or SAP -> FC -> L2-normalized embedding [B, 1, nOut].

TPU-first notes: all convs run in NHWC layout; the SE gate's global average
pool + two tiny FCs stay fused by XLA; the reference's internal 16 kHz
MelSpectrogram frontend (`torchfb`, ResNetSE34V2.py:123-126) is dead code —
the model always receives precomputed mels (model.py:223 log_input=False) —
so it is deliberately not rebuilt here.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from zerovox_tpu.models.layers import BatchNorm, Conv2d


class SELayer(nn.Module):
    """Squeeze-and-excitation gate (reference ResNetSE34V2.py:52-67)."""

    channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        y = jnp.mean(x, axis=(1, 2))  # global average pool
        y = nn.Dense(max(1, self.channels // self.reduction), name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.channels, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    """conv-relu-bn-conv-bn-se + residual, relu (reference ResNetSE34V2.py:69-99
    — note the reference's unusual relu-before-bn1 ordering, kept here)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x

        out = Conv2d(self.planes, (3, 3), strides=(self.stride, self.stride),
                     padding=(1, 1), use_bias=False, name="conv1")(x)
        out = jax.nn.relu(out)
        out = BatchNorm(self.planes, name="bn1")(out, use_running_average=not self.train)

        out = Conv2d(self.planes, (3, 3), padding=(1, 1), use_bias=False, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, use_running_average=not self.train)
        out = SELayer(self.planes, name="se")(out)

        if self.downsample:
            residual = Conv2d(self.planes, (1, 1), strides=(self.stride, self.stride),
                              padding=(0, 0), use_bias=False, name="downsample_conv")(x)
            residual = BatchNorm(self.planes, name="downsample_bn")(residual, use_running_average=not self.train)

        return jax.nn.relu(out + residual)


class ResNetSE34V2(nn.Module):
    layers: tuple[int, ...] = (3, 4, 6, 3)
    num_filters: tuple[int, ...] = (32, 64, 128, 256)
    n_out: int = 528
    encoder_type: str = "ASP"
    n_mels: int = 80
    log_input: bool = False
    # nn.remat each SE-ResNet block: recompute activations in backward
    # instead of storing the [B, C, 80, T]-scale stem tensors between fwd
    # and bwd. Measured SLOWER on v5e (+7-9% step time — recompute costs
    # more than reload even though the stack sits at the HBM roof; see
    # docs/PERFORMANCE.md round-3 roofline), so this is a memory lever
    # only. Param/batch_stats trees are unchanged either way.
    remat: bool = False

    @nn.compact
    def __call__(self, x, l2_norm: bool = True, train: bool = False):
        """x: [B, T, n_mels] log-mel -> [B, 1, n_out] speaker embedding."""
        # torch path: transpose to [B, n_mels, T], InstanceNorm1d(n_mels)
        # normalizes each mel bin over time. In NHWC we keep [B, T, mels] and
        # normalize over T per bin — identical math.
        if self.log_input:
            x = jnp.log(x + 1e-6)
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)

        # [B, H=n_mels, W=T, C=1] (freq as height, time as width, as in torch)
        x = jnp.transpose(x, (0, 2, 1))[..., None]

        x = Conv2d(self.num_filters[0], (3, 3), padding=(1, 1), use_bias=True, name="conv1")(x)
        x = jax.nn.relu(x)
        x = BatchNorm(self.num_filters[0], name="bn1")(x, use_running_average=not train)

        block_cls = nn.remat(SEBasicBlock) if self.remat else SEBasicBlock
        inplanes = self.num_filters[0]
        for stage, (blocks, planes) in enumerate(zip(self.layers, self.num_filters)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != planes)
                x = block_cls(planes, stride=s, downsample=down, train=train,
                              name=f"layer{stage + 1}_{b}")(x)
                inplanes = planes

        # [B, H', W', C] -> flatten freq+channels per time step: [B, W', H'*C]
        B, H, W, C = x.shape
        # torch: x.reshape(B, -1, W) flattens (C, H) in C-major order from
        # [B, C, H, W]; NHWC equivalent: transpose to [B, C, H, W] then reshape
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C * H, W)

        # attentive pooling over time (reference ResNetSE34V2.py:130-136)
        w = jnp.transpose(x, (0, 2, 1))  # [B, W, CH] for 1x1 convs as Dense
        w = nn.Dense(128, name="att_conv1")(w)
        w = jax.nn.relu(w)
        w = BatchNorm(128, name="att_bn")(w, use_running_average=not train)
        w = nn.Dense(C * H, name="att_conv2")(w)
        w = jax.nn.softmax(jnp.transpose(w, (0, 2, 1)), axis=2)  # [B, CH, W]

        if self.encoder_type == "SAP":
            pooled = jnp.sum(x * w, axis=2)
        elif self.encoder_type == "ASP":
            mu = jnp.sum(x * w, axis=2)
            sg = jnp.sqrt(jnp.clip(jnp.sum((x**2) * w, axis=2) - mu**2, 1e-5, None))
            pooled = jnp.concatenate([mu, sg], axis=1)
        else:
            raise ValueError("Undefined encoder")

        out = nn.Dense(self.n_out, name="fc")(pooled)

        if l2_norm:
            out = out / jnp.maximum(jnp.linalg.norm(out, axis=1, keepdims=True), 1e-12)

        return out[:, None, :]
