"""Space-to-depth lane packing for narrow HiFi-GAN vocoder stages.

The late upsample stages (C=64, C=32) waste the MXU: a C=32 conv tap uses
1/16 of each 128x128 tile (docs/PERFORMANCE.md vocoder decomposition —
stage4 alone was 7.0 of 15.7 ms device time). This module folds P = 128/C
consecutive time steps into the lane dimension ([T, C] -> [T/P, P*C], a
pure row-major reshape) and re-expresses every conv of the stage as a small
set of row-shifted 128x128 block matmuls at FULL tile utilization:

  * a 'same' conv (kernel k, dilation d) becomes matmuls
    out[tp] += sum_r  x_packed[tp + r] @ W_r,  where
    W_r[pi*C + ci, po*C + co] = w[tap, ci, co] for every (tap, po) with
    po + (tap - half)*d == P*r + pi  — the "banded 128x128 block matrix";
  * the stage's ConvTranspose1d upsample (stride s) becomes the same form
    between input packing (P_in, C_in) and output packing
    (P_out = s*P_in, C_out): torch semantics t_out = s*t_in + (k-1-p) - tap
    give W_r[pi*C_in + ci, po*C_out + co] = w[tap, ci, co] for every
    (tap, po) with (po + tap - (k-1-p)) divisible by s and
    (po + tap - (k-1-p))/s == P_in*r + pi.

Tap-matmul accounting for the standard 3/7/11 x (1,3,5) MRF at C=32:
the unpacked kernel issues 6*(3+7+11) = 126 row-matmuls over T rows (each
at 1/16 utilization); packed needs ~100 shift-matmuls over T/4 rows — ~5x
less MXU time (C=64: ~3.6x). The fused Pallas kernel (fused_packed_stage)
additionally keeps the whole stage — leaky_relu, upsample, all MRF towers —
in one VMEM residency, eliminating the post-upsample HBM round trip of the
widest activation (the north-star kernel claim: BASELINE.json names
"ConvTranspose1d upsampling + multi-receptive-field resblocks").

Weight transforms run inside the jitted graph (cheap, O(k*128^2) scatters)
so the parameter tree is untouched and checkpoints import unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zerovox_tpu.ops.pallas.resblock import _leaky, _roll


# ------------------------------------------------------------ weight packing


def same_conv_plan(k: int, dilation: int, P: int) -> tuple[tuple[int, ...], list]:
    """Static placement plan for a 'same' conv: shifts + per-shift list of
    (tap, pi, po) block placements."""
    half = (k - 1) // 2
    placements: dict[int, list] = {}
    for tap in range(k):
        off = (tap - half) * dilation
        for po in range(P):
            j = po + off
            r, pi = j // P, j % P
            placements.setdefault(r, []).append((tap, pi, po))
    shifts = tuple(sorted(placements))
    return shifts, [placements[r] for r in shifts]


def transpose_conv_plan(k: int, stride: int, padding: int, p_in: int,
                        p_out: int) -> tuple[tuple[int, ...], list]:
    """Static placement plan for a ConvTranspose1d between packings
    (torch semantics: t_out = s*t_in + (k-1-p) - tap)."""
    placements: dict[int, list] = {}
    for tap in range(k):
        for po in range(p_out):
            m = po + tap - (k - 1 - padding)
            if m % stride:
                continue
            j = m // stride
            r, pi = j // p_in, j % p_in
            placements.setdefault(r, []).append((tap, pi, po))
    shifts = tuple(sorted(placements))
    return shifts, [placements[r] for r in shifts]


def build_shift_mats(w: jnp.ndarray, plan, c_in: int, c_out: int,
                     lanes: int = 128) -> jnp.ndarray:
    """Assemble [S, lanes, lanes] block matrices from conv weights
    w [k, c_in, c_out] following a placement plan (traced; runs as a few
    static scatters inside the jitted graph)."""
    shifts, placements = plan
    mats = []
    for blocks in placements:
        m = jnp.zeros((lanes, lanes), w.dtype)
        for tap, pi, po in blocks:
            m = m.at[pi * c_in:(pi + 1) * c_in,
                     po * c_out:(po + 1) * c_out].add(w[tap])
        mats.append(m)
    return jnp.stack(mats)


def pack_rows(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, T, C] -> [B, T/p, p*C] (row-major: a pure reshape)."""
    B, T, C = x.shape
    assert T % p == 0
    return x.reshape(B, T // p, p * C)


def unpack_rows(x: jnp.ndarray, p: int, c: int) -> jnp.ndarray:
    B, Tp, PC = x.shape
    return x.reshape(B, Tp * p, c)


def apply_packed_conv(xp: jnp.ndarray, shifts, mats, bias=None) -> jnp.ndarray:
    """XLA reference of the packed conv: [Tp, L] zero-shifted matmuls.
    Used by tests and as the non-Pallas packed fallback."""
    Tp = xp.shape[0]
    out = None
    for s, m in zip(shifts, mats):
        if s == 0:
            shifted = xp
        elif s > 0:
            shifted = jnp.concatenate([xp[s:], jnp.zeros((s, xp.shape[1]), xp.dtype)])
        else:
            shifted = jnp.concatenate([jnp.zeros((-s, xp.shape[1]), xp.dtype), xp[:s]])
        term = jnp.dot(shifted, m, preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    if bias is not None:
        out = out + bias  # (1, lanes) broadcasts over rows
    return out


def pack_bias(b: jnp.ndarray, p: int) -> jnp.ndarray:
    # (1, lanes): Mosaic wants >= 2-D VMEM operands (1-D refs fault)
    return jnp.tile(b, p)[None, :]


# ------------------------------------------------------------- fused kernel


def _stage_plan(up_k: int, stride: int, up_pad: int, p_in: int, p_out: int,
                kernel_sizes, dilations, post_k: int | None = None):
    """All static placement plans + the packed-row halo for one stage."""
    up_plan = transpose_conv_plan(up_k, stride, up_pad, p_in, p_out)
    tower_plans = []
    for k in kernel_sizes:
        pairs = []
        for d in dilations:
            pairs.append((same_conv_plan(k, d, p_out),
                          same_conv_plan(k, 1, p_out)))
        tower_plans.append(pairs)
    post_plan = same_conv_plan(post_k, 1, p_out) if post_k else None

    def span(plan):
        return max(abs(s) for s in plan[0])

    halo = span(up_plan) + max(
        sum(span(p1) + span(p2) for p1, p2 in pairs) for pairs in tower_plans)
    if post_plan:
        halo += span(post_plan)
    # round up to the sublane granule: the DMA window (tile + 2*halo rows)
    # must be a multiple of 8 rows or the copy faults on hardware
    halo = (halo + 3) // 4 * 4
    return up_plan, tower_plans, post_plan, halo


def _packed_stage_kernel(x_hbm, *refs, plans, n_towers, n_pairs, tile, halo,
                         t_in, t_out, p_in, p_out, c_in, c_out):
    up_plan, tower_plans, post_plan = plans
    # refs order: up_m, up_b, then per tower per pair: m1, b1, m2, b2;
    # then optionally post_m, post_b; then o_ref, win_scratch, sem
    n_w = 2 + n_towers * n_pairs * 4 + (2 if post_plan else 0)
    o_ref, win_scratch, sem = refs[n_w], refs[n_w + 1], refs[n_w + 2]

    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * halo), :], win_scratch, sem)
    dma.start()
    dma.wait()

    rows = tile + 2 * halo
    lanes = win_scratch.shape[1]
    row_pos = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0) + i * tile - halo
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    pos_in = row_pos * p_in + lane_idx // c_in
    valid_in = (pos_in >= 0) & (pos_in < t_in)
    pos_out = row_pos * p_out + lane_idx // c_out
    valid_out = (pos_out >= 0) & (pos_out < t_out)

    def conv(win, plan, mats_ref, bias_ref):
        shifts, _ = plan
        out = None
        for s_i, s in enumerate(shifts):
            # out[tp] += win[tp + s] @ M: roll by -s brings row tp+s to tp
            shifted = _roll(win, -s) if s != 0 else win
            term = jnp.dot(shifted, mats_ref[s_i].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            out = term if out is None else out + term
        return out + bias_ref[0].astype(jnp.float32)[None, :]

    x0 = jnp.where(valid_in, win_scratch[:].astype(jnp.float32), 0.0)
    up = conv(_leaky(x0), up_plan, refs[0], refs[1])
    up = jnp.where(valid_out, up, 0.0)

    acc = jnp.zeros_like(up)
    for t in range(n_towers):
        base = 2 + t * n_pairs * 4
        win = up
        for p in range(n_pairs):
            m1, b1, m2, b2 = refs[base + 4 * p: base + 4 * p + 4]
            p1, p2 = tower_plans[t][p]
            xt = conv(_leaky(win), p1, m1, b1)
            xt = jnp.where(valid_out, xt, 0.0)
            xt = conv(_leaky(xt), p2, m2, b2)
            win = jnp.where(valid_out, win + xt, 0.0)
        acc = acc + win
    acc = acc / n_towers
    if post_plan:
        # final leaky(0.01) -> conv_post -> tanh folded into the last stage
        # (reference hifigan.py:126-128); output lanes 0..p_out-1 carry the
        # waveform samples of each packed row
        base = 2 + n_towers * n_pairs * 4
        w = jnp.where(acc >= 0, acc, acc * 0.01)
        w = conv(w, post_plan, refs[base], refs[base + 1])
        acc = jnp.tanh(w)
    o_ref[0, :, :] = acc[halo: halo + tile, :].astype(o_ref.dtype)


def _pick_tile(up_plan, tower_plans, halo: int, post_plan=None,
               budget: int = 15 * 2**20) -> int:
    """Largest power-of-two packed-row tile under the 16 MB/core scoped-VMEM
    limit. Resident shift matrices are fixed; the tile-dependent cost is
    the window scratch + live (rows, 128) f32 temporaries + output
    double-buffering — Mosaic's stack accounting measured ~18 live
    row-buffers on the standard 3/7/11 x (1,3,5) stage (tile=1024 at the
    C=64 stage allocated 16.03 MB total, weights 6.2 MB), so budget for 20."""
    n_mats = len(up_plan[0]) + sum(
        len(p1[0]) + len(p2[0]) for pairs in tower_plans for p1, p2 in pairs)
    if post_plan:
        n_mats += len(post_plan[0])
    weights = n_mats * 128 * 128 * 4
    tile = 1024
    while tile > 128:
        rows = tile + 2 * halo
        live = 20 * rows * 128 * 4
        if weights + live <= budget:
            break
        tile //= 2
    return tile


def fused_packed_stage(
    x: jnp.ndarray,                  # [B, T_in, C_in] pre-upsample, pre-leaky
    up_kernel: jnp.ndarray,          # [k, C_in, C_out]
    up_bias: jnp.ndarray,            # [C_out]
    stride: int,
    up_padding: int,
    towers,                          # list of (w1 [P,k,C,C], b1, w2, b2)
    dilations: tuple[int, ...],
    kernel_sizes: tuple[int, ...],
    post: tuple | None = None,       # (w [k, C_out, 1], b [1]): fold
    #                                  leaky(0.01)+conv_post+tanh (last stage)
    tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One full vocoder stage — leaky_relu -> ConvTranspose1d -> MRF mean —
    as a single lane-packed Pallas kernel. Returns [B, T_out, C_out], or the
    final waveform [B, T_out] when `post` is given.

    Requires 128 % C_in == 0 and stride * (128//C_in) * C_out == 128 (true
    for the standard config's C=128->64 and 64->32 stages)."""
    B, T_in, C_in = x.shape
    up_k, _, C_out = up_kernel.shape
    p_in = 128 // C_in
    p_out = stride * p_in
    assert p_out * C_out == 128, (p_out, C_out)
    T_out = (T_in - 1) * stride + up_k - 2 * up_padding

    post_k = post[0].shape[0] if post is not None else None
    up_plan, tower_plans, post_plan, halo = _stage_plan(
        up_k, stride, up_padding, p_in, p_out, kernel_sizes, dilations, post_k)
    if tile is None:
        tile = _pick_tile(up_plan, tower_plans, halo, post_plan)

    # assemble shift matrices (a few static scatters in the jitted graph)
    up_m = build_shift_mats(up_kernel, up_plan, C_in, C_out)
    up_b = pack_bias(up_bias, p_out)
    flat = [up_m, up_b]
    for (w1, b1, w2, b2), pairs in zip(towers, tower_plans):
        for p, (plan1, plan2) in enumerate(pairs):
            flat += [build_shift_mats(w1[p], plan1, C_out, C_out),
                     pack_bias(b1[p], p_out),
                     build_shift_mats(w2[p], plan2, C_out, C_out),
                     pack_bias(b2[p], p_out)]
    if post is not None:
        pw, pb = post
        post_b = jnp.zeros((1, 128), pw.dtype).at[0, :p_out].set(pb[0])
        flat += [build_shift_mats(pw, post_plan, C_out, 1), post_b]

    # pack input rows; pad so packed length is a whole number of tiles + halo
    T_in_pad = ((T_in + p_in - 1) // p_in) * p_in
    xr = jnp.pad(x, ((0, 0), (0, T_in_pad - T_in), (0, 0)))
    xp = pack_rows(xr, p_in)                      # [B, Tp, 128]
    Tp = xp.shape[1]
    num_tiles = (Tp + tile - 1) // tile
    Tp_pad = num_tiles * tile
    xp = jnp.pad(xp, ((0, 0), (halo, halo + (Tp_pad - Tp)), (0, 0)))

    plans = (up_plan, tower_plans, post_plan)
    win = tile + 2 * halo
    out = pl.pallas_call(
        functools.partial(
            _packed_stage_kernel, plans=plans, n_towers=len(towers),
            n_pairs=len(dilations), tile=tile, halo=halo,
            t_in=T_in, t_out=T_out, p_in=p_in, p_out=p_out,
            c_in=C_in, c_out=C_out),
        grid=(B, num_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat),
        out_specs=pl.BlockSpec((1, tile, 128), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp_pad * 1, 128), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((win, 128), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, *flat)
    if post is not None:
        # waveform lives in lanes 0..p_out-1 of each packed row
        wav = out[:, :Tp, :p_out].reshape(B, Tp * p_out)
        return wav[:, :T_out]
    out = unpack_rows(out[:, :Tp, :], p_out, C_out)[:, :T_out, :]
    return out


def packed_stage_reference(x, up_kernel, up_bias, stride, up_padding,
                           towers, dilations, kernel_sizes):
    """Plain-XLA packed-math reference (tests; shares the placement plans
    with the kernel but applies them with zero-padded shifts)."""
    B, T_in, C_in = x.shape
    up_k, _, C_out = up_kernel.shape
    p_in = 128 // C_in
    p_out = stride * p_in
    T_out = (T_in - 1) * stride + up_k - 2 * up_padding

    up_plan, tower_plans, _, _ = _stage_plan(
        up_k, stride, up_padding, p_in, p_out, kernel_sizes, dilations)
    up_m = build_shift_mats(up_kernel, up_plan, C_in, C_out)
    up_b = pack_bias(up_bias, p_out)

    T_in_pad = ((T_in + p_in - 1) // p_in) * p_in
    outs = []
    for b in range(B):
        xb = jnp.pad(x[b], ((0, T_in_pad - T_in), (0, 0)))
        xp = pack_rows(xb[None], p_in)[0]
        up = apply_packed_conv(_leaky(xp), up_plan[0], up_m, up_b)
        # mask rows past T_out (upsample bias would otherwise leak)
        lane_phase = jnp.arange(128) // C_out
        pos = jnp.arange(up.shape[0])[:, None] * p_out + lane_phase[None, :]
        valid = pos < T_out
        up = jnp.where(valid, up, 0.0)
        acc = jnp.zeros_like(up)
        for (w1, b1, w2, b2), pairs in zip(towers, tower_plans):
            win = up
            for p, (plan1, plan2) in enumerate(pairs):
                m1 = build_shift_mats(w1[p], plan1, C_out, C_out)
                m2 = build_shift_mats(w2[p], plan2, C_out, C_out)
                xt = apply_packed_conv(_leaky(win), plan1[0], m1, pack_bias(b1[p], p_out))
                xt = jnp.where(valid, xt, 0.0)
                xt = apply_packed_conv(_leaky(xt), plan2[0], m2, pack_bias(b2[p], p_out))
                win = jnp.where(valid, win + xt, 0.0)
            acc = acc + win
        outs.append(unpack_rows((acc / len(towers))[None], p_out, C_out)[0, :T_out])
    return jnp.stack(outs)
