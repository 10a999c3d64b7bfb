"""Pallas TPU kernel: fused HiFi-GAN ResBlock1.

One ResBlock1 (reference hifigan.py:25-62) is a chain of three
[leaky_relu -> dilated conv(k, d_i) -> leaky_relu -> conv(k, 1) -> +residual]
pairs. Run as separate XLA ops, each conv round-trips the full [T, C]
activation through HBM — at vocoder scale (T up to ~450k samples after
upsampling) the block is bandwidth-bound. This kernel keeps one time-tile of
the activation resident in VMEM across all six convs and both residual adds,
so HBM sees exactly one read and one write of x per block.

Layout: x [T, C] float32 (batch folded by the caller; the synthesis path is
B=1). Convs run as k shifted-window matmuls on the MXU. Each grid step DMAs a
(tile + 2*halo) input window from HBM into VMEM scratch — the halo covers the
block's total receptive field, and x arrives pre-padded so edge tiles read
zeros (matching XLA conv zero padding).

Used for the late upsample stages (C <= 128) where the six conv kernels fit
VMEM; wider stages fall back to the im2col XLA path (models/layers.py).
Verified against `resblock1_reference` in tests (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _leaky(x):
    return jnp.where(x >= 0, x, x * LRELU_SLOPE)


def _halo(kernel_size: int, dilations) -> int:
    r = 0
    half = (kernel_size - 1) // 2
    for d in dilations:
        r += half * d + half  # dilated conv + plain conv per pair
    return r


def _roll(x, shift: int):
    shift = shift % x.shape[0]  # pltpu.roll requires a non-negative shift
    try:
        return pltpu.roll(x, shift, 0)
    except Exception:  # interpret mode on CPU
        return jnp.roll(x, shift, axis=0)


def _conv_same(win, w, dilation: int):
    """'same' conv over the VMEM window via k circularly-shifted matmuls.
    Wrap-around rows are garbage, but they stay within the halo (the halo is
    sized to the block's total receptive field and never written out).
    `win` must be f32 (Mosaic cannot rotate non-32-bit data); bf16 weights
    are upcast per-tap in VMEM."""
    k = w.shape[0]
    half = (k - 1) // 2
    out = None
    for i in range(k):
        off = (i - half) * dilation
        shifted = _roll(win, -off) if off != 0 else win
        term = jnp.dot(shifted, w[i].astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    return out


def _resblock_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, win_scratch, sem,
                     *, dilations, tile, halo, seq_len):
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * halo), :],
        win_scratch,
        sem,
    )
    dma.start()
    dma.wait()

    # rows outside the real sequence must stay exactly zero before every conv
    # (XLA pads each intermediate conv input with zeros; biases would
    # otherwise leak nonzero values into the halo and corrupt edge outputs)
    win_len = tile + 2 * halo
    C = win_scratch.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (win_len, C), 0) + i * tile - halo
    valid = (pos >= 0) & (pos < seq_len)

    # compute in f32: Mosaic's roll has no bf16 support, and f32
    # accumulation matches the XLA path's numerics
    win = jnp.where(valid, win_scratch[:].astype(jnp.float32), 0.0)
    for p, d in enumerate(dilations):
        xt = _leaky(win)
        xt = _conv_same(xt, w1_ref[p], d) + b1_ref[p][None, :]
        xt = jnp.where(valid, xt, 0.0)  # conv2's implicit zero padding
        xt = _leaky(xt)
        xt = _conv_same(xt, w2_ref[p], 1) + b2_ref[p][None, :]
        win = jnp.where(valid, win + xt, 0.0)
    o_ref[0, :, :] = win[halo : halo + tile, :].astype(o_ref.dtype)


def fused_resblock1(
    x: jnp.ndarray,  # [B, T, C] or [T, C]
    w1: jnp.ndarray,  # [n_pairs, k, C, C] dilated convs
    b1: jnp.ndarray,  # [n_pairs, C]
    w2: jnp.ndarray,  # [n_pairs, k, C, C] plain convs
    b2: jnp.ndarray,  # [n_pairs, C]
    dilations: tuple[int, ...],
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batch is a leading grid dimension (not vmap: Pallas cannot batch a
    memory-space-ANY operand, and a grid axis reuses the VMEM weights)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    B, T, C = x.shape
    k = w1.shape[1]
    halo = _halo(k, tuple(dilations))

    # Mosaic wants the lane (channel) dimension at 128; zero-pad narrower
    # stages — padded channels stay exactly zero through the whole block
    # (leaky(0)=0, zero kernels, zero bias), so the slice back is exact.
    C_out = C
    if C < 128:
        pad_c = 128 - C
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_c)))
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, pad_c), (0, pad_c)))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, pad_c), (0, pad_c)))
        b1 = jnp.pad(b1, ((0, 0), (0, pad_c)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad_c)))
        C = 128

    num_tiles = (T + tile - 1) // tile
    T_pad = num_tiles * tile
    xp = jnp.pad(x, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))

    win = tile + 2 * halo
    out = pl.pallas_call(
        functools.partial(_resblock_kernel, dilations=tuple(dilations), tile=tile, halo=halo, seq_len=T),
        grid=(B, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, C), x.dtype),
        scratch_shapes=[
            # window scratch follows the input dtype (bf16 inference halves
            # the DMA bytes and resident VMEM; matmuls still accumulate f32)
            pltpu.VMEM((win, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w1, b1, w2, b2)
    out = out[:, :T, :C_out]
    return out[0] if squeeze else out


def resblock1_reference(x, w1, b1, w2, b2, dilations):
    """Plain-XLA reference of the same block (for tests and fallback)."""
    from zerovox_tpu.models.layers import conv1d_im2col

    win = x[None]
    k = w1.shape[1]
    for i, d in enumerate(dilations):
        xt = _leaky(win)
        xt = conv1d_im2col(xt, w1[i], padding=((k - 1) // 2) * d, dilation=d) + b1[i]
        xt = _leaky(xt)
        xt = conv1d_im2col(xt, w2[i], padding=(k - 1) // 2, dilation=1) + b2[i]
        win = win + xt
    return win[0]
