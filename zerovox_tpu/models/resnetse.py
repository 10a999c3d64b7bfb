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
import numpy as np

from zerovox_tpu.models.layers import BatchNorm, Conv2d

# ---------------------------------------------------------------------------
# 2x2 space-to-depth lane packing for the stride-1 C=32 stage.
#
# bench_se_stages.py: layer1 (three stride-1 SE-ResNet blocks at full
# [B, 80, T, 32] resolution) is 57% of the encoder backward at 6% MFU —
# C=32 in the minor (lane) dimension wastes 3/4 of every 128-wide tile on
# both the MXU and the VPU. Packing 2x2 spatial phases into channels
# (C 32 -> 128, exactly one lane tile) re-expresses every op of the block
# with identical math; the parameter tree stays canonical [3,3,C,C] so
# checkpoints and the torch converter are unaffected. Parity + roofline:
# scripts/exp_se_packed.py, tests/test_parity_modules.py.
# ---------------------------------------------------------------------------


def _pack2x2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], phase-major p = 2*ph + pw."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H // 2, W // 2, 4 * C)


def _unpack2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _pack2x2."""
    B, H2, W2, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, H2, W2, 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H2 * 2, W2 * 2, C)


def _phase_axis_maps():
    # For packed tap r and (input phase p, output phase q) along one axis the
    # original tap offset is d = 2*(r-1) + p - q, valid iff |d| <= 1. One
    # gather+mask per call keeps the weight transform differentiable and
    # cheap to compile (vs 144 scatters).
    idx = np.zeros((3, 2, 2), np.int32)
    msk = np.zeros((3, 2, 2), np.float32)
    for r in range(3):
        for p in range(2):
            for q in range(2):
                d = 2 * (r - 1) + p - q
                if -1 <= d <= 1:
                    idx[r, p, q] = d + 1
                    msk[r, p, q] = 1.0
    return idx, msk


_IDX_H, _MSK_H = _phase_axis_maps()


def _pack_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Canonical [3, 3, Ci, Co] conv kernel -> [3, 3, 4Ci, 4Co] packed kernel.

    The packed kernel is a fixed phase-structured rearrangement (with zeros)
    of the canonical taps; convolving the packed activation with it equals
    the canonical 3x3 stride-1 SAME conv on the unpacked activation.
    Gradients flow through the gather back to the canonical parameter.
    """
    ci, co = w.shape[2], w.shape[3]
    idx = jnp.asarray(_IDX_H)
    msk = jnp.asarray(_MSK_H)
    # g[rh, ph, qh, rw, pw, qw, ci, co] = w[dh+1, dw+1, ci, co] * valid
    g = w[idx[:, :, :, None, None, None], idx[None, None, None]]
    g = g * (msk[:, :, :, None, None, None]
             * msk[None, None, None])[..., None, None].astype(w.dtype)
    # -> [rh, rw, (ph pw ci), (qh qw co)] = [3, 3, 4Ci, 4Co]
    g = jnp.transpose(g, (0, 3, 1, 4, 6, 2, 5, 7))
    return g.reshape(3, 3, 4 * ci, 4 * co)


def _pack_kernel_s2(w: jnp.ndarray) -> jnp.ndarray:
    """Canonical [3, 3, Ci, Co] kernel -> [3, 3, 4Ci, Co]: a stride-2 SAME
    conv on the unpacked input re-expressed as a stride-1 SAME conv on the
    _pack2x2 input, emitting the (unpacked) stride-2 output grid directly.

    Per axis, output position i reads unpacked positions 2i+d (d in -1..1) =
    packed row i+t-1 phase p with d = 2*(t-1) + p — the stride-1 tap map at
    output phase q=0 — so the axis maps are _IDX_H/_MSK_H sliced at q=0
    (t=2 taps are all zero; keeping the 3-tap shape reuses symmetric SAME
    padding, and the dead taps cost ~micro-seconds of MXU time at these
    shapes)."""
    ci, co = w.shape[2], w.shape[3]
    idx = jnp.asarray(_IDX_H[:, :, 0])
    msk = jnp.asarray(_MSK_H[:, :, 0])
    # g[th, ph, tw, pw, ci, co] = w[dh+1, dw+1, ci, co] * valid
    g = w[idx[:, :, None, None], idx[None, None]]
    g = g * (msk[:, :, None, None] * msk[None, None])[..., None, None].astype(w.dtype)
    g = jnp.transpose(g, (0, 2, 1, 3, 4, 5))  # [th, tw, ph, pw, ci, co]
    return g.reshape(3, 3, 4 * ci, co)


class SELayer(nn.Module):
    """Squeeze-and-excitation gate (reference ResNetSE34V2.py:52-67).

    With `phases` > 1 the input's channel axis holds `phases` spatial phases
    of the same `channels` channels (phase-major, _pack2x2 layout): the
    squeeze averages over space AND phases per original channel and the gate
    is tiled back — exactly the unpacked op."""

    channels: int
    reduction: int = 8
    phases: int = 1

    @nn.compact
    def __call__(self, x, pool=None):  # x: [B, H, W, phases*C]
        """With `pool` [B, C] given, x is ignored and only the excitation is
        returned as [B, C] gates (the fused stage-1 path computes the squeeze
        inside its conv kernel via linearity; ops/pallas/se_fused.py)."""
        if pool is None:
            if self.phases == 1:
                y = jnp.mean(x, axis=(1, 2))  # global average pool
            else:
                B, H, W, _ = x.shape
                y = jnp.mean(x.reshape(B, H, W, self.phases, self.channels),
                             axis=(1, 2, 3))
        else:
            y = pool
        y = nn.Dense(max(1, self.channels // self.reduction), name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.channels, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        if pool is not None:
            return y
        if self.phases > 1:
            y = jnp.tile(y, self.phases)
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    """conv-relu-bn-conv-bn-se + residual, relu (reference ResNetSE34V2.py:69-99
    — note the reference's unusual relu-before-bn1 ordering, kept here)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False
    # phases=4: operate on the _pack2x2 space-to-depth layout (stride-1,
    # no-downsample blocks only). Same math, same param/batch_stats trees.
    phases: int = 1
    # packed_transition: a stride-2 downsample block that CONSUMES a packed
    # input and EMITS a packed output — the stride-2 convs become stride-1
    # phase-gathered convs on the packed grid (_pack_kernel_s2 / phase-(0,0)
    # slice for the 1x1 downsample), so the C-narrow boundary tensor between
    # stages never materializes in the lane-padded layout. Same trees.
    packed_transition: bool = False

    @nn.compact
    def __call__(self, x, fused_affine=None, fused_spec=None):
        if fused_spec is not None:
            return self._fused_call(x, fused_affine, fused_spec)
        if self.packed_transition:
            return self._transition_call(x)
        if self.phases != 1:
            assert self.phases == 4 and self.stride == 1 and not self.downsample, \
                "lane packing supports stride-1 residual blocks only"
        packed = self.phases == 4
        ktrans = _pack_kernel if packed else None
        kin = self.planes if packed else None

        residual = x

        out = Conv2d(self.planes, (3, 3), strides=(self.stride, self.stride),
                     padding=(1, 1), use_bias=False, name="conv1")(
                         x, kernel_transform=ktrans, kernel_in=kin)
        out = jax.nn.relu(out)
        out = BatchNorm(self.planes, name="bn1")(
            out, use_running_average=not self.train, phases=self.phases)

        out = Conv2d(self.planes, (3, 3), padding=(1, 1), use_bias=False, name="conv2")(
            out, kernel_transform=ktrans, kernel_in=kin)
        out = BatchNorm(self.planes, name="bn2")(
            out, use_running_average=not self.train, phases=self.phases)
        out = SELayer(self.planes, phases=self.phases, name="se")(out)

        if self.downsample:
            residual = Conv2d(self.planes, (1, 1), strides=(self.stride, self.stride),
                              padding=(0, 0), use_bias=False, name="downsample_conv")(x)
            residual = BatchNorm(self.planes, name="downsample_bn")(residual, use_running_average=not self.train)

        return jax.nn.relu(out + residual)

    def _transition_call(self, x):
        """Packed-in/packed-out stride-2 block (see packed_transition)."""
        assert self.stride == 2 and self.downsample, \
            "packed_transition is a stride-2 downsample block"
        cin = x.shape[-1] // 4  # canonical in-channels under the packing
        ra = not self.train

        # stride-2 3x3 conv == stride-1 phase-gathered conv on the packed
        # grid, emitting the stride-2 output grid (== the packed grid)
        out = Conv2d(self.planes, (3, 3), strides=(1, 1), padding=(1, 1),
                     use_bias=False, name="conv1")(
                         x, kernel_transform=_pack_kernel_s2, kernel_in=cin)
        out = _pack2x2(out)  # re-pack for this stage's resolution
        out = jax.nn.relu(out)
        out = BatchNorm(self.planes, name="bn1")(out, use_running_average=ra,
                                                 phases=4)
        out = Conv2d(self.planes, (3, 3), padding=(1, 1), use_bias=False,
                     name="conv2")(out, kernel_transform=_pack_kernel,
                                   kernel_in=self.planes)
        out = BatchNorm(self.planes, name="bn2")(out, use_running_average=ra,
                                                 phases=4)
        out = SELayer(self.planes, phases=4, name="se")(out)

        # 1x1 stride-2 downsample reads only the unpacked (0,0) phase —
        # exactly the first `cin` channels of the phase-major packed layout
        residual = Conv2d(self.planes, (1, 1), strides=(1, 1), padding=(0, 0),
                          use_bias=False, name="downsample_conv")(x[..., :cin])
        residual = _pack2x2(residual)
        residual = BatchNorm(self.planes, name="downsample_bn")(
            residual, use_running_average=ra, phases=4)

        return jax.nn.relu(out + residual)

    def _fused_call(self, x, fused_affine, spec):
        """Fused stage-1 path (ops/pallas/se_fused.py): the whole block is
        two Pallas conv passes with fused BN prologues and stats/SE-squeeze
        epilogues, plus one XLA elementwise boundary. `fused_affine` is the
        (s, t) [1, 128] affine that still has to be applied to this block's
        input (block 0: the stem BN; identity after) — it runs inside
        conv1's prologue, and on the residual inside the boundary. x is in
        the stored-width layout [B, H2, nw*tile, 128]; same param /
        batch_stats trees as the unfused path."""
        from zerovox_tpu.ops.pallas import se_fused as sf

        assert self.phases == 4 and self.stride == 1 and not self.downsample
        C = self.planes
        phases = 4
        B, h2 = x.shape[0], x.shape[1]
        n = B * h2 * spec.w_true * phases
        s_in, t_in = fused_affine
        dt = x.dtype

        k1, _ = Conv2d(C, (3, 3), padding=(1, 1), use_bias=False,
                       name="conv1")(None, kernel_in=C, return_params=True)
        k2, _ = Conv2d(C, (3, 3), padding=(1, 1), use_bias=False,
                       name="conv2")(None, kernel_in=C, return_params=True)
        bn1 = BatchNorm(C, name="bn1")
        bn2 = BatchNorm(C, name="bn2")
        g1, b1, rm1, rv1 = bn1(None, return_params=True)
        g2, b2, rm2, rv2 = bn2(None, return_params=True)

        w1 = sf.pack_taps(_pack_kernel(k1), dt)
        w2 = sf.pack_taps(_pack_kernel(k2), dt)

        t1, ssum, ssq, _ = sf.se_conv(x, w1, s_in, t_in,
                                      spec._replace(relu_out=True))
        if self.train:
            mean1 = sf.fold_phases(ssum, phases) / n
            var1 = sf.fold_phases(ssq, phases) / n - mean1 * mean1
            bn1(None, update_stats=(mean1, var1, n))
        else:
            mean1, var1 = rm1, rv1
        s1, tt1 = sf.affine_packed(g1, b1, mean1, var1, 1e-5, phases)

        t2, ssum2, ssq2, m = sf.se_conv(t1, w2, s1, tt1,
                                        spec._replace(relu_out=False))
        if self.train:
            mean2 = sf.fold_phases(ssum2, phases) / n
            var2 = sf.fold_phases(ssq2, phases) / n - mean2 * mean2
            bn2(None, update_stats=(mean2, var2, n))
        else:
            mean2, var2 = rm2, rv2
        s2, tt2 = sf.affine_packed(g2, b2, mean2, var2, 1e-5, phases)

        # SE gate from the linear squeeze (pool = bn2(mean_hw(conv2 out)))
        pool = m.reshape(B, phases, C).sum(1) / (h2 * spec.w_true * phases)
        pool = pool * s2[0, :C] + tt2[0, :C]
        gate = SELayer(C, phases=phases, name="se")(None, pool=pool)
        gate = jnp.tile(gate, (1, phases))

        # boundary: bn2-apply, gate, residual (with this block's pending
        # input affine), relu — one fused XLA elementwise pass
        return jax.nn.relu((t2.astype(jnp.float32) * s2 + tt2)
                           * gate[:, None, None, :]
                           + x.astype(jnp.float32) * s_in + t_in).astype(dt)


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
    # 2x2 space-to-depth lane packing of the first `packed_stages` stages
    # (plus the stem): 1 packs the C=32 full-resolution stage (57% of the
    # encoder backward at 6% MFU — see module docstring above _pack2x2);
    # 2 extends through stage 2's stride-2 transition so the C-narrow
    # boundary tensor never materializes lane-padded. Identical math and
    # trees at any level; each pack point requires even spatial dims
    # (always true in training: ref mels are a fixed 500x80 crop) and
    # silently stops extending otherwise.
    packed_stages: int = 0
    # Run the stem conv itself in the packed layout too (kernel transforms
    # to [3,3,4,128]; params stay canonical [3,3,1,32]). Measured on the
    # v5e (docs/bench_se_stages_r3c.json): packing the stem is REQUIRED
    # for the level-1 win — running the stem unpacked and space-to-depth'ing
    # its [B,80,T,32] output hits an XLA layout pathology (encoder fwd+grad
    # 29.2 ms vs 9.3 ms with the packed stem vs 15.5 unpacked), even though
    # the isolated stem rows suggested the opposite. Identical math and
    # trees either way; the knob stays for the A/B record.
    packed_stem: bool = True
    # Run the packed stage-1 chain through the fused Pallas conv passes
    # (ops/pallas/se_fused.py): one read + one write per conv, BN stats and
    # the SE squeeze folded into conv epilogues, custom-VJP backward.
    # Requires packed_stages >= 1 + packed_stem and 4*num_filters[0] == 128.
    # Identical math and trees; interpret mode is picked automatically on
    # CPU backends so tests exercise the same code path.
    fused_stage1: bool = False

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

        # The packed region covers the stem + stage 1 (see packed_stem for
        # the measured reason the stem must be inside it): pack the
        # 1-channel input (cheap — nothing is padded yet) and run
        # stem + stage 1 entirely in the [H/2, W/2, 4C] layout.
        pack0 = (self.packed_stages >= 1
                 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        stem_packed = pack0 and self.packed_stem
        if stem_packed:
            x = _pack2x2(x)
        stem_kw = (dict(kernel_transform=_pack_kernel, kernel_in=1,
                        bias_phases=4) if stem_packed else {})
        x = Conv2d(self.num_filters[0], (3, 3), padding=(1, 1), use_bias=True,
                   name="conv1")(x, **stem_kw)
        x = jax.nn.relu(x)
        bn_stem = BatchNorm(self.num_filters[0], name="bn1")
        fused = (self.fused_stage1 and stem_packed
                 and 4 * self.num_filters[0] == 128 and self.layers[0] >= 1)
        if fused:
            # stem-BN stats from one XLA reduction over the stem output; the
            # BN apply itself rides block 0's conv1 prologue (se_fused.py)
            from zerovox_tpu.ops.pallas import se_fused as sf

            interpret = jax.default_backend() == "cpu"
            B, h2, w2v, _ = x.shape
            spec = sf.make_spec(h2, w2v, relu_out=True, interpret=interpret)
            C0 = self.num_filters[0]
            n = B * h2 * w2v * 4
            gs, bs, rms, rvs = bn_stem(None, return_params=True)
            if train:
                xr = x.astype(jnp.float32).reshape(-1, 4, C0)
                mean = jnp.sum(xr, axis=(0, 1)) / n
                var = jnp.sum(xr * xr, axis=(0, 1)) / n - mean * mean
                bn_stem(None, update_stats=(mean, var, n))
            else:
                mean, var = rms, rvs
            s_in, t_in = sf.affine_packed(gs, bs, mean, var, 1e-5, 4)
            x = jnp.pad(x, ((0, 0), (0, 0),
                            (0, sf.stored_width(spec) - w2v), (0, 0)))
            for b in range(self.layers[0]):
                x = SEBasicBlock(C0, train=train, phases=4,
                                 name=f"layer1_{b}")(
                    x, fused_affine=(s_in, t_in), fused_spec=spec)
                s_in = jnp.ones((1, 128), jnp.float32)
                t_in = jnp.zeros((1, 128), jnp.float32)
            x = x[:, :, :w2v, :]
        else:
            x = bn_stem(x, use_running_average=not train,
                        phases=4 if stem_packed else 1)
            if pack0 and not stem_packed:
                x = _pack2x2(x)

        block_cls = nn.remat(SEBasicBlock) if self.remat else SEBasicBlock
        inplanes = self.num_filters[0]
        packed = pack0  # is x currently in the _pack2x2 layout?
        for stage, (blocks, planes) in enumerate(zip(self.layers, self.num_filters)):
            if fused and stage == 0:
                continue  # stage 1 already ran through the fused chain
            stride = 1 if stage == 0 else 2
            # extend the packed region across this stage's stride-2
            # transition, or leave it before this stage's first block
            extend = (packed and stage > 0 and stage < self.packed_stages
                      and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
            if packed and stage > 0 and not extend:
                x = _unpack2x2(x)
                packed = False
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != planes)
                x = block_cls(planes, stride=s, downsample=down, train=train,
                              packed_transition=packed and s == 2,
                              phases=4 if (packed and s != 2) else 1,
                              name=f"layer{stage + 1}_{b}")(x)
                inplanes = planes
        if packed:
            x = _unpack2x2(x)

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
