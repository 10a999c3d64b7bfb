"""Fused VMEM-resident speaker-encoder stage 1 (VERDICT r3 task #3).

The post-packing train-step roofline (docs/bench_decomp_r3b_packed.json)
puts the ResNetSE34V2 speaker encoder at 6.6 ms fwd+bwd for B=8 — 139% of
the v5e HBM roof — with the packed stem+stage-1 chain the dominant slice.
XLA materializes activations around every 3x3 conv and re-reads saved
residuals in the backward; bytes, not FLOPs, bound the stage. This module
re-implements the stage-1 SE-ResNet chain (reference
zerovox/tts/ResNetSE34V2.py:69-99, three stride-1 blocks on the 2x2
lane-packed [B, H/2, W/2, 128] grid of models/resnetse.py) as Pallas conv
passes with fused prologues/epilogues and custom VJPs, so each conv costs
one activation read + one write, and the backward streams each saved bf16
activation exactly once.

Train-mode BatchNorm is a batch-global barrier (statistics need the full
conv output before the normalized tensor exists anywhere), so the stage
cannot be one kernel without recomputation. It is a chain of conv passes
whose epilogues fold in everything the barriers need:

  * each conv pass accumulates per-channel (sum, sum-of-squares) across
    the whole (batch x tile) grid — BN statistics come out of the SAME
    pass that writes the conv output, no separate stats read-pass;
  * the SE squeeze is LINEAR in the conv2 output and BN is affine, so the
    per-sample SE pool is accumulated in conv2's epilogue, before BN
    statistics are final: pool = bn2_affine(mean_hw(conv2_out));
  * BN application fuses into the NEXT conv's prologue (one multiply-add
    on the VMEM-resident window);
  * block boundaries (bn2-apply, SE gate, residual add, relu) are pure
    elementwise and stay in XLA, which fuses them into one pass.

The backward kernel fuses dgrad, wgrad, the BN-statistics cotangents and
the prologue-affine parameter reductions into one pass over (x, y, dy).

Layout: tensors are [B, H2, TW, 128] with TW = ceil(W2/tile)*tile; tail
cols may hold garbage (boundary passes write there) — every kernel masks
loads to the true width and zeroes invalid output cols, so only the final
[:, :, :W2] slice leaves the fused region.

Parity: tests/test_se_fused.py checks forward, gradients and BN batch
statistics against the unfused packed module path in interpret mode.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
HALO = 8  # window halo cols: conv needs 1; 8 is the sublane/DMA granule


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _roll(x, shift: int):
    shift = shift % x.shape[0]
    try:
        return pltpu.roll(x, shift, 0)
    except Exception:  # interpret mode on CPU
        return jnp.roll(x, shift, axis=0)


# ------------------------------------------------------------ conv helpers


def _conv9(x_pad, w_ref, transpose_w: bool, h2: int, wc: int, tile: int,
           use_roll: bool):
    """3x3 SAME conv over the VMEM window scratch x_pad [h2+2, wc, 128]
    (rows 0 / h2+1 zero, invalid cols pre-masked) -> f32 [h2, tile, 128]
    for output cols [HALO, HALO+tile). w_ref [9,128,128], tap dh*3+dw;
    transpose_w applies the dgrad weights (flipped taps, transposed)."""

    def wmat(dh, dw):
        if not transpose_w:
            return w_ref[dh * 3 + dw]
        return w_ref[(2 - dh) * 3 + (2 - dw)].T

    if use_roll:
        # flattened-roll formulation: Mosaic rotates 32-bit data only, so
        # the window scratch is f32; each shifted term casts to bf16 for the
        # MXU. Roll wrap garbage lands only in the H-pad rows / W-halo cols,
        # never read as output and zero in any wgrad operand.
        flat = x_pad[:].reshape((h2 + 2) * wc, LANES)
        acc = jnp.zeros((h2 * wc, LANES), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                s = (dh - 1) * wc + dw - 1
                t = flat if s == 0 else _roll(flat, -s)
                acc += jax.lax.dot_general(
                    t[wc:(h2 + 1) * wc].astype(jnp.bfloat16),
                    wmat(dh, dw).astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return acc.reshape(h2, wc, LANES)[:, HALO:HALO + tile, :]

    # rank-3 dot_general over static slices (bf16-native, no rolls)
    acc = jnp.zeros((h2, tile, LANES), jnp.float32)
    for dh in range(3):
        rows = x_pad[dh:dh + h2]
        for dw in range(3):
            sl = rows[:, HALO - 1 + dw:HALO - 1 + dw + tile, :]
            acc += jax.lax.dot_general(
                sl, wmat(dh, dw),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _wgrad9(u_pad, g_pad, dw_ref, h2: int, wc: int, use_roll: bool):
    """dw[tap] += u shifted by the tap, contracted with g over THIS tile's
    owned output cols [HALO, HALO+tile) — halo cols hold valid neighbors'
    outputs (kept for dgrad) and contracting them would double-count at
    tile seams. Callers of the roll variant must pre-mask g_pad to the
    owned cols (after dgrad, which needs the halo)."""
    tile = wc - 2 * HALO
    if use_roll:
        uflat = u_pad[:].reshape((h2 + 2) * wc, LANES)
        gflat = g_pad[:].reshape((h2 + 2) * wc, LANES)
        gb = gflat.astype(jnp.bfloat16)
        for dh in range(3):
            for dw in range(3):
                s = (dh - 1) * wc + dw - 1
                us = uflat if s == 0 else _roll(uflat, -s)
                dw_ref[dh * 3 + dw] += jax.lax.dot_general(
                    us.astype(jnp.bfloat16), gb,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return
    # Mosaic's tpu.matmul rejects >1 contracting dim, so the (h2, tile)
    # spatial contraction is flattened to a single rank-2 dim. The slices
    # are strided in the window (tile cols out of wc), so each operand is
    # staged through a contiguous reshape before the transposed matmul.
    g_own = g_pad[1:h2 + 1, HALO:HALO + tile, :].reshape(h2 * tile, LANES)
    for dh in range(3):
        us_rows = u_pad[dh:dh + h2]
        for dw in range(3):
            us = us_rows[:, HALO - 1 + dw:HALO - 1 + dw + tile, :]
            dw_ref[dh * 3 + dw] += jax.lax.dot_general(
                us.reshape(h2 * tile, LANES), g_own,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _col_mask(i, tile: int, wc: int, w_true: int, dtype):
    """[1, wc, 1] mask of window cols whose global col is in [0, w_true)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wc, 1), 1)
    g = col + i * tile - HALO
    return ((g >= 0) & (g < w_true)).astype(dtype)


def _dma_window(src, b, i, dst, sem, h2: int, tile: int, nw: int,
                stage=None):
    """DMA src[b, :, i*tile-HALO : i*tile+tile+HALO, :] into dst rows
    [1:h2+1], clipping at the array edges (zeros into the clipped halo).
    Col offsets/sizes stay multiples of the 8-sublane DMA granule.

    `stage`: same-window scratch in src's dtype, required when dst's dtype
    differs (the roll formulation keeps f32 windows but the arrays are
    bf16, and tpu.enqueue_dma rejects element-type mismatches) — the DMA
    lands in `stage` and a VPU cast moves it into dst."""
    if stage is not None:
        _dma_window(src, b, i, stage, sem, h2, tile, nw)
        dst[1:h2 + 1] = stage[1:h2 + 1].astype(dst.dtype)
        return
    wc = tile + 2 * HALO
    if nw == 1:
        dst[1:h2 + 1, 0:HALO, :] = jnp.zeros((h2, HALO, LANES), dst.dtype)
        dst[1:h2 + 1, HALO + tile:wc, :] = jnp.zeros((h2, HALO, LANES),
                                                     dst.dtype)
        cp = pltpu.make_async_copy(src.at[b, :, :, :],
                                   dst.at[1:h2 + 1, HALO:HALO + tile, :], sem)
        cp.start()
        cp.wait()
        return

    @pl.when(i == 0)
    def _():
        dst[1:h2 + 1, 0:HALO, :] = jnp.zeros((h2, HALO, LANES), dst.dtype)
        cp = pltpu.make_async_copy(
            src.at[b, :, pl.ds(0, tile + HALO), :],
            dst.at[1:h2 + 1, HALO:wc, :], sem)
        cp.start()
        cp.wait()

    @pl.when(i == nw - 1)
    def _():
        dst[1:h2 + 1, tile + HALO:wc, :] = jnp.zeros((h2, HALO, LANES),
                                                     dst.dtype)
        cp = pltpu.make_async_copy(
            src.at[b, :, pl.ds((nw - 1) * tile - HALO, tile + HALO), :],
            dst.at[1:h2 + 1, 0:tile + HALO, :], sem)
        cp.start()
        cp.wait()

    if nw > 2:  # interior windows exist; offsets are dynamic in i. Mosaic
        # cannot prove i*tile - HALO ≡ 0 (mod 8) on its own — hint it.
        @pl.when((i > 0) & (i < nw - 1))
        def _():
            off = pl.multiple_of(i * tile - HALO, 8)
            cp = pltpu.make_async_copy(
                src.at[b, :, pl.ds(off, wc), :],
                dst.at[1:h2 + 1, :, :], sem)
            cp.start()
            cp.wait()


# ----------------------------------------------------------- forward kernel


def _fwd_kernel(x_hbm, w_ref, s_ref, t_ref,
                y_ref, sum_ref, sq_ref, m_ref,
                x_pad, *scratch,
                h2, tile, w_true, nw, relu_out, use_roll, staged=False):
    if staged:
        x_stage, sem = scratch
    else:
        (sem,) = scratch
        x_stage = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    wc = tile + 2 * HALO

    @pl.when((b == 0) & (i == 0))
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)
        x_pad[0:1] = jnp.zeros_like(x_pad[0:1])
        x_pad[h2 + 1:h2 + 2] = jnp.zeros_like(x_pad[h2 + 1:h2 + 2])

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.zeros_like(m_ref)

    _dma_window(x_hbm, b, i, x_pad, sem, h2, tile, nw, stage=x_stage)

    mask = _col_mask(i, tile, wc, w_true, jnp.float32)
    x_pad[1:h2 + 1] = ((x_pad[1:h2 + 1].astype(jnp.float32)
                        * s_ref[0][None, None, :]
                        + t_ref[0][None, None, :]) * mask).astype(x_pad.dtype)

    acc = _conv9(x_pad, w_ref, False, h2, wc, tile, use_roll)
    y = jnp.maximum(acc, 0.0) if relu_out else acc

    col = jax.lax.broadcasted_iota(jnp.int32, (1, tile, 1), 1)
    yv = y * ((col + i * tile) < w_true).astype(jnp.float32)

    y_ref[0] = yv.astype(y_ref.dtype)
    red = jnp.sum(yv, axis=(0, 1))[None, :]
    sum_ref[:] += red
    sq_ref[:] += jnp.sum(yv * yv, axis=(0, 1))[None, :]
    m_ref[0] += red


# ---------------------------------------------------------- backward kernel


def _bwd_kernel(x_hbm, y_hbm, dy_hbm, w_ref, s_ref, t_ref,
                dsum_ref, dsq_ref, dm_ref,
                dx_ref, dw_ref, ds_ref, dt_ref,
                g_pad, u_pad, *scratch,
                h2, tile, w_true, nw, relu_out, use_roll, staged=False):
    """Fused backward for one conv pass.

    Forward: u = x*s + t; y = relu?(conv(u)); outputs (y, sum, sq, m) where
    sum/sq/m are sums of y. Given cotangents (dy, dsum, dsq, dm):
      g  = (dy + dsum + 2*y*dsq + dm_b) * relu'?(y)
      du = conv(g, flipped-transposed taps)          (dgrad)
      dx = du * s;  ds = sum du*x;  dt = sum du      (prologue affine)
      dw[tap] = sum u_shifted^T @ g                  (wgrad)
    x is recovered as u/s with s clamped away from 0 — exact unless a BN
    gamma passes through |gamma| < 1e-12, where ds for that channel degrades
    gracefully to 0 instead of the true value.
    One pass loads x, y, dy once; dgrad and wgrad share the g window.
    """
    if staged:
        stage, sem = scratch
    else:
        (sem,) = scratch
        stage = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    wc = tile + 2 * HALO

    @pl.when((b == 0) & (i == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)
        dt_ref[:] = jnp.zeros_like(dt_ref)
        g_pad[0:1] = jnp.zeros_like(g_pad[0:1])
        g_pad[h2 + 1:h2 + 2] = jnp.zeros_like(g_pad[h2 + 1:h2 + 2])
        u_pad[0:1] = jnp.zeros_like(u_pad[0:1])
        u_pad[h2 + 1:h2 + 2] = jnp.zeros_like(u_pad[h2 + 1:h2 + 2])

    # stage y into u_pad, dy into g_pad, combine into g in place, then
    # overwrite u_pad with x — no window is ever held live across a DMA
    _dma_window(y_hbm, b, i, u_pad, sem, h2, tile, nw, stage=stage)
    _dma_window(dy_hbm, b, i, g_pad, sem, h2, tile, nw, stage=stage)

    mask = _col_mask(i, tile, wc, w_true, jnp.float32)
    yf = u_pad[1:h2 + 1].astype(jnp.float32)
    g = (g_pad[1:h2 + 1].astype(jnp.float32)
         + dsum_ref[0][None, None, :]
         + 2.0 * yf * dsq_ref[0][None, None, :]
         + dm_ref[b][None, None, :])
    if relu_out:
        g = g * (yf > 0).astype(jnp.float32)
    g_pad[1:h2 + 1] = (g * mask).astype(g_pad.dtype)

    _dma_window(x_hbm, b, i, u_pad, sem, h2, tile, nw, stage=stage)
    u_pad[1:h2 + 1] = ((u_pad[1:h2 + 1].astype(jnp.float32)
                        * s_ref[0][None, None, :]
                        + t_ref[0][None, None, :]) * mask).astype(u_pad.dtype)

    du = _conv9(g_pad, w_ref, True, h2, wc, tile, use_roll)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tile, 1), 1)
    omask = ((col + i * tile) < w_true).astype(jnp.float32)
    du = du * omask

    dx_ref[0] = (du * s_ref[0][None, None, :]).astype(dx_ref.dtype)
    # x is recovered from u = x*s + t (exact; clamped 1/s only degrades the
    # measure-zero case |gamma| < 1e-12 to ds -> 0 for that channel)
    s_inv = jnp.sign(s_ref[0]) / jnp.maximum(jnp.abs(s_ref[0]), 1e-12)
    u_int = u_pad[1:h2 + 1, HALO:HALO + tile, :].astype(jnp.float32)
    x_rec = (u_int - t_ref[0][None, None, :] * omask) * s_inv[None, None, :]
    ds_ref[:] += jnp.sum(du * x_rec, axis=(0, 1))[None, :]
    dt_ref[:] += jnp.sum(du, axis=(0, 1))[None, :]

    if use_roll:
        # restrict g to this tile's owned cols before the full-window
        # contraction (see _wgrad9); dgrad above already consumed the halo
        wcol = jax.lax.broadcasted_iota(jnp.int32, (1, wc, 1), 1)
        own = ((wcol >= HALO) & (wcol < HALO + tile)).astype(jnp.float32)
        g_pad[1:h2 + 1] = (g_pad[1:h2 + 1].astype(jnp.float32)
                           * own).astype(g_pad.dtype)
    _wgrad9(u_pad, g_pad, dw_ref, h2, wc, use_roll)


# ------------------------------------------------------------- pallas calls


class ConvSpec(NamedTuple):
    h2: int
    w_true: int      # true col count; stored width is nw*tile >= w_true
    tile: int
    nw: int
    relu_out: bool
    use_roll: bool
    interpret: bool


def make_spec(h2: int, w2: int, *, relu_out: bool, use_roll: bool | None = None,
              interpret: bool = False, tile: int | None = None) -> ConvSpec:
    if tile is None:
        tile = _cdiv(w2, 8) * 8 if w2 <= 192 else 128
    if use_roll is None:
        # slice-einsum (rank-3 dot_general) is the bf16-native default; the
        # flattened-roll formulation (f32 scratch, per-tap bf16 casts) is the
        # fallback if Mosaic rejects multi-leading-dim dots on some toolchain
        use_roll = os.environ.get("ZEROVOX_SE_FUSED_ROLL", "0") == "1"
    return ConvSpec(h2, w2, tile, _cdiv(w2, tile), relu_out, use_roll,
                    interpret)


def stored_width(spec: ConvSpec) -> int:
    return spec.nw * spec.tile


def _fwd_call(x, wmats, s, t, spec: ConvSpec):
    B = x.shape[0]
    tw = stored_width(spec)
    if spec.use_roll:
        # f32 windows + staging double the roll path's VMEM stack; narrow
        # the tile the same way the backward does (measured OOM: 18.18 MiB
        # at tile=176, h2=40)
        spec = _bwd_spec(spec)
        assert stored_width(spec) == tw
    wc = spec.tile + 2 * HALO
    pdt = jnp.float32 if spec.use_roll else x.dtype
    staged = pdt != x.dtype  # DMA needs a same-dtype landing window
    kern = functools.partial(
        _fwd_kernel, h2=spec.h2, tile=spec.tile, w_true=spec.w_true,
        nw=spec.nw, relu_out=spec.relu_out, use_roll=spec.use_roll,
        staged=staged)
    return pl.pallas_call(
        kern,
        grid=(B, spec.nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            pl.BlockSpec((1, spec.h2, spec.tile, LANES),
                         lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            # m is [B, 1, 128] so the per-sample block (1, 1, 128) keeps its
            # last-two dims equal to the array's (Mosaic's block-shape rule
            # rejects a (1, 128) block over a (B, 128) array)
            pl.BlockSpec((1, 1, LANES), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, spec.h2, tw, LANES), x.dtype),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, LANES), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((spec.h2 + 2, wc, LANES), pdt)]
        + ([pltpu.VMEM((spec.h2 + 2, wc, LANES), x.dtype)] if staged else [])
        + [pltpu.SemaphoreType.DMA],
        interpret=spec.interpret,
    )(x, wmats, s, t)


def _bwd_spec(spec: ConvSpec) -> ConvSpec:
    """Backward-pass tiling: the fused backward holds ~4x the forward's
    live f32 intermediates per window (g, yf, du, x_rec all at
    [h2, tile, 128]), so a tile that fits the forward can blow the 16 MiB
    scoped-VMEM stack (measured: tile=176, h2=40 -> 16.84 MiB). Re-tile the
    SAME stored width with the largest tile <= 96 that divides it — block
    indexing and col masking are tile-agnostic, so this is purely a
    scheduling choice."""
    tw = stored_width(spec)
    if spec.tile <= 96:
        return spec
    for t in range(96, 7, -8):
        if tw % t == 0:
            return spec._replace(tile=t, nw=tw // t)
    return spec


def _bwd_call(x, y, dy, wmats, s, t, dsum, dsq, dm, spec: ConvSpec):
    B = x.shape[0]
    tw = stored_width(spec)
    spec = _bwd_spec(spec)
    assert stored_width(spec) == tw
    wc = spec.tile + 2 * HALO
    pdt = jnp.float32 if spec.use_roll else x.dtype
    staged = pdt != x.dtype
    kern = functools.partial(
        _bwd_kernel, h2=spec.h2, tile=spec.tile, w_true=spec.w_true,
        nw=spec.nw, relu_out=spec.relu_out, use_roll=spec.use_roll,
        staged=staged)
    return pl.pallas_call(
        kern,
        grid=(B, spec.nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(
            pl.BlockSpec((1, spec.h2, spec.tile, LANES),
                         lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, LANES, LANES), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, spec.h2, tw, LANES), x.dtype),
            jax.ShapeDtypeStruct((9, LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((spec.h2 + 2, wc, LANES), pdt),
            pltpu.VMEM((spec.h2 + 2, wc, LANES), pdt),
        ]
        + ([pltpu.VMEM((spec.h2 + 2, wc, LANES), x.dtype)] if staged else [])
        + [pltpu.SemaphoreType.DMA],
        interpret=spec.interpret,
    )(x, y, dy, wmats, s, t, dsum, dsq, dm)


# -------------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def se_conv(x, wmats, s, t, spec: ConvSpec):
    """One fused conv pass: y = relu?(conv3x3(x*s + t)).

    x      [B, H2, nw*tile, 128]  (cols >= w_true masked on load)
    wmats  [9, 128, 128]          packed 3x3 taps, index dh*3+dw
    s, t   [1, 128]               prologue affine (pass ones/zeros for none)
    -> y [B, H2, nw*tile, 128] (cols >= w_true zero), ssum/ssq [1, 128]
       per-packed-channel sums of y / y^2, m [B, 128] per-sample sums of y.
    """
    y, ssum, ssq, m = _fwd_call(x, wmats, s, t, spec)
    return y, ssum, ssq, m[:, 0, :]


def _se_conv_fwd(x, wmats, s, t, spec):
    y, ssum, ssq, m = _fwd_call(x, wmats, s, t, spec)
    return (y, ssum, ssq, m[:, 0, :]), (x, y, wmats, s, t)


def _se_conv_bwd(spec, res, cts):
    x, y, wmats, s, t = res
    dy, dsum, dsq, dm = cts
    dx, dw, ds, dt = _bwd_call(
        x, y, dy, wmats, s.astype(jnp.float32), t.astype(jnp.float32),
        dsum.astype(jnp.float32), dsq.astype(jnp.float32),
        dm.astype(jnp.float32), spec)
    return dx, dw.astype(wmats.dtype), ds.astype(s.dtype), dt.astype(s.dtype)


se_conv.defvjp(_se_conv_fwd, _se_conv_bwd)


# --------------------------------------------------------------- XLA glue


def pack_taps(kernel_packed: jnp.ndarray, dtype) -> jnp.ndarray:
    """[3, 3, 128, 128] packed conv kernel -> [9, 128, 128] tap stack."""
    return kernel_packed.reshape(9, LANES, LANES).astype(dtype)


def affine_packed(gamma, beta, mean, var, eps, phases: int):
    """Per-canonical-channel BN affine tiled to the packed lane layout."""
    s = gamma * jax.lax.rsqrt(var + eps)
    t = beta - mean * s
    return (jnp.tile(s, phases)[None, :].astype(jnp.float32),
            jnp.tile(t, phases)[None, :].astype(jnp.float32))


def fold_phases(v128, phases: int):
    """[1, 128] phase-major packed reduction -> [C] canonical."""
    return v128[0].reshape(phases, -1).sum(0)


class BlockParams(NamedTuple):
    conv1: jnp.ndarray       # packed [3, 3, 128, 128]
    conv2: jnp.ndarray       # packed [3, 3, 128, 128]
    bn1_gamma: jnp.ndarray   # [C]
    bn1_beta: jnp.ndarray
    bn2_gamma: jnp.ndarray
    bn2_beta: jnp.ndarray
    fc1_w: jnp.ndarray       # [C, C // reduction]
    fc1_b: jnp.ndarray
    fc2_w: jnp.ndarray       # [C // reduction, C]
    fc2_b: jnp.ndarray


def fused_stage1(y_stem, stem_bn, blocks, *, train: bool,
                 running: dict | None = None, eps: float = 1e-5,
                 phases: int = 4, interpret: bool = False,
                 use_roll: bool = False, tile: int | None = None):
    """Stem-BN apply + three stride-1 SE-ResNet blocks, fused.

    y_stem  [B, H2, W2, 128]  post-relu stem conv output (packed layout)
    stem_bn (gamma, beta) each [C]
    blocks  list[BlockParams] with packed conv kernels
    running eval mode: {"stem": (mean, var), "b{i}_bn1": ..., "b{i}_bn2": ...}
    returns (out [B, H2, W2, 128],
             batch_stats {name: (mean, biased var, n)} for running updates)
    """
    B, h2, w2, _ = y_stem.shape
    C = stem_bn[0].shape[0]
    n = B * h2 * w2 * phases  # positions per canonical channel
    dt = y_stem.dtype
    tw_spec = make_spec(h2, w2, relu_out=True, use_roll=use_roll,
                        interpret=interpret, tile=tile)
    tw = stored_width(tw_spec)

    def spec(relu_out):
        return tw_spec._replace(relu_out=relu_out)

    stats = {}

    def bn_stats(name, sum_c, sq_c):
        """sum_c/sq_c: folded per-canonical-channel sums [C]."""
        mean = sum_c / n
        var = sq_c / n - mean * mean
        stats[name] = (mean, var, n)
        if train:
            return mean, var
        return running[name]

    # stem BN statistics from the XLA stem output (one fused reduction pass)
    ysf = y_stem.astype(jnp.float32).reshape(-1, phases, C)
    mean, var = bn_stats("stem", jnp.sum(ysf, axis=(0, 1)),
                         jnp.sum(ysf * ysf, axis=(0, 1)))
    s_in, t_in = affine_packed(stem_bn[0], stem_bn[1], mean, var, eps, phases)

    x = jnp.pad(y_stem, ((0, 0), (0, 0), (0, tw - w2), (0, 0)))
    ones = jnp.ones((1, LANES), jnp.float32)
    zeros = jnp.zeros((1, LANES), jnp.float32)

    for bi, bp in enumerate(blocks):
        res = x
        w1 = pack_taps(bp.conv1, dt)
        w2m = pack_taps(bp.conv2, dt)

        # conv1 (prologue: bn-apply for block 0 = stem BN, identity after)
        t1, ssum, ssq, _ = se_conv(x, w1, s_in, t_in, spec(relu_out=True))
        mean1, var1 = bn_stats(f"b{bi}_bn1", fold_phases(ssum, phases),
                               fold_phases(ssq, phases))
        s1, tt1 = affine_packed(bp.bn1_gamma, bp.bn1_beta, mean1, var1, eps, phases)

        # conv2 (prologue: bn1-apply; epilogue: bn2 stats + SE squeeze)
        t2, ssum2, ssq2, m = se_conv(t1, w2m, s1, tt1, spec(relu_out=False))
        mean2, var2 = bn_stats(f"b{bi}_bn2", fold_phases(ssum2, phases),
                               fold_phases(ssq2, phases))
        s2, tt2 = affine_packed(bp.bn2_gamma, bp.bn2_beta, mean2, var2, eps, phases)

        # SE gate from the linear squeeze: pool = bn2(mean_hw(conv2 out))
        pool = m.reshape(B, phases, C).sum(1) / (h2 * w2 * phases)
        pool = pool * s2[0, :C] + tt2[0, :C]
        gate = jax.nn.sigmoid(
            jnp.maximum(pool @ bp.fc1_w + bp.fc1_b, 0.0) @ bp.fc2_w
            + bp.fc2_b)
        gate = jnp.tile(gate, (1, phases))  # [B, 128] phase-major

        # boundary: bn2-apply, gate, residual, relu — XLA fuses to one pass.
        # The residual is the block INPUT as the convs see it, i.e. with the
        # conv1 prologue affine applied (block 0: the stem BN; identity
        # after). Tail cols [w2:tw) become garbage; downstream kernels mask
        # loads and the final output is sliced, so it never escapes.
        x = jax.nn.relu((t2.astype(jnp.float32) * s2 + tt2)
                        * gate[:, None, None, :]
                        + res.astype(jnp.float32) * s_in + t_in).astype(dt)
        s_in, t_in = ones, zeros

    return x[:, :, :w2, :], stats
