"""Shared neural-net primitives with PyTorch-compatible numerics.

These are thin flax.linen modules whose math matches the torch ops the
reference composes its models from, so weights imported from reference
checkpoints (zerovox_tpu.checkpoint) reproduce outputs bit-for-bit (up to
float associativity). Everything operates in NHC/NLC layout (batch, length,
channels) — the TPU-friendly layout — rather than torch's NCL.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# 1-D/2-D conv lowering: "auto" | "native" (lax.conv_general_dilated) |
# "im2col" (tap-gather + one MXU matmul). Round 1 shipped im2col everywhere
# after measuring native convs as ~1000x slower — that measurement used
# block_until_ready, which is NOT an execution fence on tunneled TPU
# backends (docs/PERFORMANCE.md "Backend quirks"). Honest forced-marginal
# timing (scripts/bench_conv_impl.py, v5e) splits by batch:
#   * batched/training shapes: native wins big (1.6-1.9x fwd on the k=9 FFN
#     conv, ~9x on its gradient) and avoids materializing k x the
#     activation, which was OOMing B=64 training;
#   * batch-1 serving shapes: im2col is faster end-to-end (bench.py RTF
#     0.0182 im2col vs 0.0190 native; first-chunk p50 77 vs 88 ms).
# "auto" therefore picks im2col for B==1 programs and native otherwise.
# Read at trace time (not import time) so it behaves like the other runtime
# switches (ZEROVOX_USE_PALLAS / ZEROVOX_WIRE_DTYPE): setting it after
# importing zerovox_tpu still takes effect for the next compiled program.


def _impl(batch: int) -> str:
    impl = os.environ.get("ZEROVOX_CONV_IMPL", "auto")
    if impl == "auto":
        return "im2col" if batch == 1 else "native"
    return impl


def torch_std(x: jnp.ndarray, axis: int = -1, keepdims: bool = True) -> jnp.ndarray:
    """torch.std with Bessel correction (unbiased, n-1 denominator).

    A tiny epsilon inside the sqrt (forward error < 1e-6, far below parity
    tolerance) keeps the gradient finite on zero-variance rows — e.g. fully
    padded frames — where d sqrt(0) would otherwise be inf and poison masked
    positions with 0*inf = NaN."""
    n = x.shape[axis]
    mu = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.sum((x - mu) ** 2, axis=axis, keepdims=keepdims) / max(n - 1, 1)
    return jnp.sqrt(var + 1e-12)


def conv1d(x, kernel, stride=1, padding=0, dilation=1):
    """1-D conv over [B, T, Cin] with torch semantics; lowering picked by
    ZEROVOX_CONV_IMPL (see module docstring). k==1 is a plain matmul."""
    if kernel.shape[0] == 1 and stride == 1 and dilation == 1 and padding == 0:
        out_dt = jnp.promote_types(x.dtype, kernel.dtype)
        return jnp.einsum("btc,co->bto", x, kernel[0],
                          preferred_element_type=jnp.float32).astype(out_dt)
    if _impl(x.shape[0]) == "im2col":
        return conv1d_im2col(x, kernel, stride, padding, dilation)
    # lax.conv requires equal dtypes (the im2col einsum promotes); mirror
    # numpy promotion so bf16-mixed training (f32 position tables added to
    # bf16 activations) keeps working
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    return jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt),
        window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"))


def conv1d_im2col(x, kernel, stride=1, padding=0, dilation=1):
    """1-D conv as tap-gather + single MXU matmul.

    The kernel width is a small static constant, so unrolling into k strided
    slices and one (T, k*Cin) x (k*Cin, Cout) dot keeps the FLOPs on the
    systolic array. Kept as the ZEROVOX_CONV_IMPL=im2col fallback and as the
    reference path for the Pallas kernels; the default lowering is native
    (see module docstring for the measured comparison).
    """
    k = kernel.shape[0]
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    T_pad = x.shape[1]
    eff_k = (k - 1) * dilation + 1
    T_out = (T_pad - eff_k) // stride + 1

    taps = [
        jax.lax.slice_in_dim(x, i * dilation, i * dilation + (T_out - 1) * stride + 1, stride, axis=1)
        for i in range(k)
    ]
    patches = jnp.stack(taps, axis=2)  # [B, T_out, k, Cin]
    # f32 MXU accumulation; output keeps the compute dtype (bf16 in, bf16
    # out) so mixed precision does not upcast downstream
    out_dt = jnp.promote_types(x.dtype, kernel.dtype)
    return jnp.einsum("btkc,kco->bto", patches, kernel,
                      preferred_element_type=jnp.float32).astype(out_dt)


class Conv1d(nn.Module):
    """1-D convolution over [B, L, C_in] -> [B, L_out, C_out].

    Torch Conv1d semantics: cross-correlation, symmetric zero padding of
    `padding` samples, optional dilation/stride/groups. Kernel stored as
    (width, in_per_group, out). Lowering picked by ZEROVOX_CONV_IMPL (module
    docstring); grouped convs (only the GAN discriminators use them) always
    go through lax.conv.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch // self.groups, self.features),
        )
        if self.groups == 1:
            y = conv1d(x, kernel, self.stride, self.padding, self.dilation)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(self.stride,),
                padding=[(self.padding, self.padding)],
                rhs_dilation=(self.dilation,),
                feature_group_count=self.groups,
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


def conv2d(x, kernel, stride=(1, 1), padding=(1, 1)):
    """2-D conv over [B, H, W, Cin]; lowering picked by ZEROVOX_CONV_IMPL
    (native avoids the kh*kw im2col activation blowup on the speaker
    encoder's [B, 344, 80, C] tensors)."""
    if _impl(x.shape[0]) == "im2col":
        return conv2d_im2col(x, kernel, stride, padding)
    ph, pw = padding
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    return jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt),
        window_strides=tuple(stride), padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv2d_im2col(x, kernel, stride=(1, 1), padding=(1, 1)):
    """2-D conv as kh*kw shifted slices + one MXU matmul (same rationale as
    conv1d_im2col: XLA's conv lowering on this backend is far slower than the
    equivalent matmul for small-batch inference shapes).

    x [B, H, W, C], kernel [kh, kw, Cin, Cout] (nn.Conv layout), zero padding.
    """
    kh, kw, Cin, Cout = kernel.shape
    sh, sw = stride
    ph, pw = padding
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    Ho = (H - kh) // sh + 1
    Wo = (W - kw) // sw + 1

    taps = []
    for i in range(kh):
        rows = jax.lax.slice_in_dim(x, i, i + (Ho - 1) * sh + 1, sh, axis=1)
        for j in range(kw):
            taps.append(jax.lax.slice_in_dim(rows, j, j + (Wo - 1) * sw + 1, sw, axis=2))
    patches = jnp.stack(taps, axis=3)  # [B, Ho, Wo, kh*kw, Cin]
    out_dt = jnp.promote_types(x.dtype, kernel.dtype)
    return jnp.einsum("bhwkc,kco->bhwo", patches,
                      kernel.reshape(kh * kw, Cin, Cout),
                      preferred_element_type=jnp.float32).astype(out_dt)


class Conv2d(nn.Module):
    """2-D convolution (torch semantics, NHWC). Kernel
    param layout matches flax nn.Conv ((kh, kw, in, out)), so checkpoint
    conversion is unchanged."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, kernel_transform=None,
                 kernel_in: int | None = None,
                 bias_phases: int = 1,
                 return_params: bool = False):
        """`kernel_transform` maps the canonical [kh, kw, in, out] param to the
        kernel actually convolved (e.g. space-to-depth lane packing,
        resnetse._pack_kernel): the param tree and checkpoints stay canonical
        while the compute runs in a different layout. `kernel_in` overrides the
        param's in-channel count when the transform changes it; `bias_phases`
        tiles the canonical per-channel bias across the transform's output
        phases (phase-major layout). `return_params` skips the compute and
        returns (kernel, bias|None) for fused kernels (the packed.py
        ConvTranspose1d pattern); x may be None then, but `kernel_in` is
        required."""
        kh, kw = self.kernel_size
        cin = x.shape[-1] if kernel_in is None else kernel_in
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features))
        if return_params:
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,)) if self.use_bias else None)
            return kernel, bias
        k = kernel if kernel_transform is None else kernel_transform(kernel)
        y = conv2d(x, k, self.strides, self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (b if bias_phases == 1 else jnp.tile(b, bias_phases))
        return y


class ConvTranspose1d(nn.Module):
    """Transposed 1-D convolution matching torch.nn.ConvTranspose1d.

    out_len = (L-1)*stride - 2*padding + kernel_size. Implemented as an
    input-dilated forward conv (lhs_dilation=stride, padding k-1-p), which is
    exactly torch's gradient-of-conv semantics. The kernel param is stored in
    (width, in, out) HIO layout *already spatially flipped*, i.e. a torch
    weight (in, out, k) imports as flip(transpose(W, (2, 0, 1)), axis=0).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.features),
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else jnp.zeros((self.features,), kernel.dtype))
        if return_params:
            # raw (kernel, bias) for the fused packed-stage vocoder kernel
            # (ops/pallas/packed.py) — same param tree, no compute here
            return kernel, bias
        y = conv_transpose1d_subpixel(x, kernel, self.stride, self.padding)
        if self.use_bias:
            y = y + bias
        return y


def conv_transpose1d_subpixel(x, kernel, stride: int, padding: int):
    """Transposed conv as per-phase tap matmuls + interleave (subpixel view).

    Equivalent to the input-dilated conv formulation (y[t] = sum_w K[w] *
    x[(t + w - (k-1-p)) / s] over divisible indices) but with the zero
    multiplications removed and every contraction expressed as an MXU matmul:
    output phase q (t = m*s + q) only receives kernel taps w == (k-1-p-q) mod
    s, i.e. ceil(k/s) taps per phase, gathered as static slices of the padded
    input and contracted in one einsum per phase; phases interleave by
    reshape. Matches torch ConvTranspose1d exactly (same flipped (k, Cin,
    Cout) kernel layout as the dilated formulation).
    """
    B, T, Cin = x.shape
    k, _, Cout = kernel.shape
    s = stride
    if s == 1:
        return conv1d(x, kernel, 1, k - 1 - padding, 1)

    pad0 = k - 1 - padding
    T_out = (T - 1) * s + k - 2 * padding
    M = (T_out + s - 1) // s

    # per-phase tap sets and input offsets
    phase_plan = []
    lo, hi = 0, T - 1
    for q in range(s):
        w0 = (pad0 - q) % s
        c = (q + w0 - pad0) // s
        taps = list(range(w0, k, s))
        offs = [c + u for u in range(len(taps))]
        if offs:
            lo = min(lo, min(offs))
            hi = max(hi, (M - 1) + max(offs))
        phase_plan.append((taps, offs))

    pad_left = max(0, -lo)
    pad_right = max(0, hi - (T - 1))
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))

    phases = []
    for taps, offs in phase_plan:
        if not taps:
            phases.append(jnp.zeros((B, M, Cout), x.dtype))
            continue
        patches = jnp.stack(
            [jax.lax.slice_in_dim(xp, pad_left + o, pad_left + o + M, 1, axis=1) for o in offs],
            axis=2,
        )  # [B, M, U, Cin]
        kq = kernel[jnp.array(taps)]  # [U, Cin, Cout]
        phases.append(jnp.einsum("bmuc,uco->bmo", patches, kq,
                                 preferred_element_type=jnp.float32)
                      .astype(jnp.promote_types(x.dtype, kernel.dtype)))

    y = jnp.stack(phases, axis=2).reshape(B, M * s, Cout)
    return y[:, :T_out, :]


class InstanceNorm(nn.Module):
    """InstanceNorm1d over the length axis of [B, L, C] (torch semantics:
    normalize each channel over L per sample; running stats not tracked)."""

    features: int
    affine: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + bias
        return y


class BatchNorm(nn.Module):
    """BatchNorm matching torch eval/train semantics on [B, ..., C]."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True,
                 phases: int = 1, return_params: bool = False,
                 update_stats: tuple | None = None):
        """With `phases` > 1, x's channel axis holds `phases` spatial phases of
        the same `features` channels (phase-major: index p*features + c, the
        space-to-depth layout of resnetse packing). Batch statistics reduce
        over the phase axis too, so train-mode stats and running-stat updates
        are exactly those of the unpacked tensor.

        Fused-kernel hooks: `return_params` skips the compute and returns
        (scale, bias, running_mean, running_var); `update_stats=(mean,
        biased_var, n)` applies exactly the train-mode running-stat update
        this module would perform (torch unbiased-var convention) for
        statistics computed externally (ops/pallas/se_fused.py)."""
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features))

        if update_stats is not None:
            mean, var, n = update_stats
            if not self.is_initializing():
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
            return None
        if return_params:
            return scale, bias, ra_mean.value, ra_var.value

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if phases == 1:
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(x, axis=axes)
                # batch statistics use biased variance for normalization...
                var = jnp.mean((x - mean.reshape((1,) * (x.ndim - 1) + (-1,))) ** 2, axis=axes)
                n = np.prod([x.shape[a] for a in axes])
            else:
                xr = x.reshape(x.shape[:-1] + (phases, self.features))
                axes = tuple(range(xr.ndim - 1))
                mean = jnp.mean(xr, axis=axes)
                var = jnp.mean((xr - mean) ** 2, axis=axes)
                n = np.prod([xr.shape[a] for a in axes])
            if not self.is_initializing():
                # ...but torch updates running_var with the unbiased estimate
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        if phases > 1:
            mean, var = jnp.tile(mean, phases), jnp.tile(var, phases)
            scale, bias = jnp.tile(scale, phases), jnp.tile(bias, phases)
        shape = (1,) * (x.ndim - 1) + (-1,)
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean.reshape(shape)) * inv.reshape(shape) * scale.reshape(shape) + bias.reshape(shape)


class LinearNorm(nn.Module):
    """Linear projection (reference fs2.py:93-106); bias optional."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.xavier_uniform(), (x.shape[-1], self.features))
        y = x @ kernel
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class SCLN(nn.Module):
    """Speaker-Conditional Layer Normalization (reference fs2.py:63-90):
    o = g(s) * (x - mu) / (sigma + eps) + b(s), with torch's *unbiased* std
    and eps added to sigma (not variance)."""

    hidden_size: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        sigma = torch_std(x, axis=-1, keepdims=True)
        y = (x - mu) / (sigma + self.eps)

        affine = LinearNorm(2 * self.hidden_size, use_bias=False, name="affine_layer")(s)
        b, g = jnp.split(affine, 2, axis=-1)
        return g * y + b


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm over the last axis (biased variance, eps inside sqrt)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + self.eps) * scale + bias


class WeightNormConv1d(nn.Module):
    """Conv1d with weight-norm parametrization (g * v/||v||), matching
    torch.nn.utils.weight_norm(Conv1d) with dim=0: one g per output channel,
    norm taken over (in, k). Used by the StyleTTS decoder and HiFi-GAN during
    training; checkpoint import can either keep (g, v) or fold them."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        v = self.param(
            "v", nn.initializers.lecun_normal(), (self.kernel_size, in_ch // self.groups, self.features)
        )
        g = self.param("g", nn.initializers.ones, (self.features,))
        # norm over (width, in) per output channel
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True) + 1e-12)
        kernel = v * (g[None, None, :] / norm)
        if self.groups == 1:
            y = conv1d(x, kernel, self.stride, self.padding, self.dilation)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(self.stride,),
                padding=[(self.padding, self.padding)],
                rhs_dilation=(self.dilation,),
                feature_group_count=self.groups,
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def get_sinusoid_encoding_table(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoid position encoding table (reference fs2.py:17-37), computed in
    float64 numpy exactly like the reference then cast to float32."""
    positions = np.arange(n_position)[:, None]
    hid_idx = np.arange(d_hid)[None, :]
    angle = positions / np.power(10000, 2 * (hid_idx // 2) / d_hid)
    table = np.zeros((n_position, d_hid))
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def leaky_relu(x: jnp.ndarray, negative_slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * negative_slope)
