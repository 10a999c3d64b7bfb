"""Pallas TPU kernel: fused HiFi-GAN multi-receptive-field (MRF) stage.

One vocoder upsample stage (reference hifigan.py:114-124) averages THREE
ResBlock1 towers (kernel sizes 3/7/11, dilations (1,3,5) each) over the same
input. As separate ops — even with each tower fused (ops/pallas/resblock.py)
— the [T, C] activation is read from HBM three times and the partial sums
written twice more. At late-stage vocoder scale (T up to ~450k samples,
C <= 128) the stage is pure HBM bandwidth, so this kernel keeps one time-tile
resident in VMEM, runs all three towers on it, and writes the average:
exactly ONE HBM read and ONE write of x per stage, and 6x fewer activation
bytes moved than the unfused path.

Weights for all towers stay VMEM-resident (~8.3 MB at C=128 f32 for the
standard 3/7/11 x (1,3,5) config). Channels are zero-padded to the 128-lane
width by the wrapper; padded lanes stay exactly zero through leaky-relu,
zero-kernel matmuls and zero biases, so the final slice is exact.

Numerics match the XLA reference path bit-for-bit up to f32 matmul
reassociation (tested in interpret mode; compiled parity on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zerovox_tpu.ops.pallas.resblock import _conv_same, _halo, _leaky


def _mrf_kernel(x_hbm, *refs, dilations, kernel_sizes, tile, halo, seq_len):
    # refs = w1_0,b1_0,w2_0,b2_0, w1_1,..., o_ref, win_scratch, sem
    n = len(kernel_sizes)
    o_ref, win_scratch, sem = refs[4 * n], refs[4 * n + 1], refs[4 * n + 2]

    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * halo), :],
        win_scratch,
        sem,
    )
    dma.start()
    dma.wait()

    win_len = tile + 2 * halo
    C = win_scratch.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (win_len, C), 0) + i * tile - halo
    valid = (pos >= 0) & (pos < seq_len)

    x0 = jnp.where(valid, win_scratch[:].astype(jnp.float32), 0.0)
    acc = jnp.zeros_like(x0)
    for t in range(n):
        w1, b1, w2, b2 = refs[4 * t: 4 * t + 4]
        win = x0
        for p, d in enumerate(dilations):
            xt = _leaky(win)
            xt = _conv_same(xt, w1[p], d) + b1[p][None, :]
            xt = jnp.where(valid, xt, 0.0)
            xt = _leaky(xt)
            xt = _conv_same(xt, w2[p], 1) + b2[p][None, :]
            win = jnp.where(valid, win + xt, 0.0)
        acc = acc + win
    # f32 VMEM accumulation; store in the output dtype (bf16 inference)
    o_ref[0, :, :] = (acc / n)[halo: halo + tile, :].astype(o_ref.dtype)


def _pick_tile(towers, dilations, kernel_sizes, c: int = 128,
               budget: int = 13 * 2**20) -> int:
    """Largest power-of-two time-tile that keeps the kernel under the ~16 MB
    VMEM core budget (with headroom for Mosaic's output double-buffering).

    Resident weights are fixed (all towers stay in VMEM); the tile-dependent
    cost is the input window scratch + output block + ~9 live (win, C) f32
    temporaries measured from Mosaic's stack accounting (tile=2048 at C=128
    allocated 19.6 MB total, 11.3 MB of it tile-dependent)."""
    n_pairs = len(dilations)
    weights = sum(2 * n_pairs * k * c * c * 4 for k in kernel_sizes)
    halo = max(_halo(k, tuple(dilations)) for k in kernel_sizes)
    tile = 2048
    while tile > 256:
        rows = tile + 2 * halo
        live = 11 * rows * c * 4  # scratch + temps + out double-buffer
        if weights + live <= budget:
            break
        tile //= 2
    return tile


def fused_mrf(
    x: jnp.ndarray,                 # [B, T, C] or [T, C]
    towers,                         # list of (w1 [P,k,C,C], b1, w2, b2)
    dilations: tuple[int, ...],
    kernel_sizes: tuple[int, ...],
    tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mean over len(towers) ResBlock1 outputs in one pass over x.

    Batch is a leading grid dimension (NOT vmap — Pallas cannot batch a
    memory-space-ANY operand, and a grid axis reuses the VMEM-resident
    weights across the whole batch anyway)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    B, T, C = x.shape
    halo = max(_halo(k, tuple(dilations)) for k in kernel_sizes)
    if tile is None:
        tile = _pick_tile(towers, dilations, kernel_sizes)

    C_out = C
    if C < 128:
        pad_c = 128 - C
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_c)))
        towers = [
            (jnp.pad(w1, ((0, 0), (0, 0), (0, pad_c), (0, pad_c))),
             jnp.pad(b1, ((0, 0), (0, pad_c))),
             jnp.pad(w2, ((0, 0), (0, 0), (0, pad_c), (0, pad_c))),
             jnp.pad(b2, ((0, 0), (0, pad_c))))
            for w1, b1, w2, b2 in towers
        ]
        C = 128

    num_tiles = (T + tile - 1) // tile
    T_pad = num_tiles * tile
    xp = jnp.pad(x, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))

    flat = [a for tower in towers for a in tower]
    win = tile + 2 * halo
    out = pl.pallas_call(
        functools.partial(_mrf_kernel, dilations=tuple(dilations),
                          kernel_sizes=tuple(kernel_sizes), tile=tile,
                          halo=halo, seq_len=T),
        grid=(B, num_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat),
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
    )(xp, *flat)
    out = out[:, :T, :C_out]
    return out[0] if squeeze else out


def mrf_reference(x, towers, dilations):
    """Plain-XLA MRF stage (mean of ResBlock1 towers), for tests/fallback."""
    from zerovox_tpu.ops.pallas.resblock import resblock1_reference

    outs = [resblock1_reference(x, w1, b1, w2, b2, dilations)
            for w1, b1, w2, b2 in towers]
    return sum(outs) / len(outs)
