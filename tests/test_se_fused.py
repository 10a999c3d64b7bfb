"""Parity tests for the fused speaker-encoder stage-1 Pallas passes
(zerovox_tpu/ops/pallas/se_fused.py) in interpret mode on CPU.

Layers of verification:
  1. se_conv forward vs a plain-XLA reference (prologue affine -> 3x3 SAME
     conv -> optional relu; sum/sq/m epilogues), across tile splits and
     both in-kernel conv formulations (slice-einsum and flattened-roll).
  2. se_conv custom VJP vs jax autodiff of the reference, with nonzero
     cotangents on ALL outputs (y, ssum, ssq, m) — the stats outputs carry
     real gradients through the BatchNorm barriers.
  3. fused_stage1 vs the unfused packed SEBasicBlock chain is covered in
     tests/test_se_packed.py-style module tests once the flax integration
     lands (test_fused_stage1_matches_module below).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zerovox_tpu.ops.pallas import se_fused
from zerovox_tpu.ops.pallas.se_fused import (BlockParams, make_spec, se_conv,
                                             stored_width)

LANES = 128


def _ref_se_conv(x, wmats, s, t, spec):
    """Plain-XLA reference of one fused conv pass (true-width region only)."""
    w2 = spec.w_true
    xv = x[:, :, :w2, :]
    u = xv * s[0] + t[0]
    k = wmats.reshape(3, 3, LANES, LANES)
    y = jax.lax.conv_general_dilated(
        u, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if spec.relu_out:
        y = jnp.maximum(y, 0.0)
    tw = stored_width(spec)
    yp = jnp.pad(y, ((0, 0), (0, 0), (0, tw - w2), (0, 0)))
    ssum = jnp.sum(y, axis=(0, 1, 2))[None, :]
    ssq = jnp.sum(y * y, axis=(0, 1, 2))[None, :]
    m = jnp.sum(y, axis=(1, 2))
    return yp, ssum, ssq, m


def _inputs(B=2, h2=8, w2=24, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, h2, w2, LANES)).astype(np.float32)
    wm = (rng.normal(size=(9, LANES, LANES)) * 0.08).astype(np.float32)
    s = rng.uniform(0.5, 1.5, (1, LANES)).astype(np.float32)
    t = rng.normal(size=(1, LANES)).astype(np.float32) * 0.3
    return jnp.asarray(x), jnp.asarray(wm), jnp.asarray(s), jnp.asarray(t)


@pytest.mark.parametrize("use_roll", [False, True])
@pytest.mark.parametrize("tile,relu", [(None, True), (16, False), (8, True)])
def test_se_conv_forward(use_roll, tile, relu):
    x, wm, s, t = _inputs()
    spec = make_spec(8, 24, relu_out=relu, use_roll=use_roll,
                     interpret=True, tile=tile)
    tw = stored_width(spec)
    xs = jnp.pad(x, ((0, 0), (0, 0), (0, tw - 24), (0, 0)))
    # garbage in the tail cols must not leak into outputs
    if tw > 24:
        xs = xs.at[:, :, 24:, :].set(7.7)
    y, ssum, ssq, m = se_conv(xs, wm, s, t, spec)
    ry, rsum, rsq, rm = _ref_se_conv(xs, wm, s, t, spec)
    tol = 5e-2 if use_roll else 1e-4  # roll path casts operands to bf16
    np.testing.assert_allclose(np.asarray(y), np.asarray(ry),
                               rtol=tol, atol=tol)
    sc = np.abs(np.asarray(rsum)).max()
    np.testing.assert_allclose(np.asarray(ssum), np.asarray(rsum),
                               rtol=tol, atol=tol * sc)
    np.testing.assert_allclose(np.asarray(ssq), np.asarray(rsq),
                               rtol=2 * tol, atol=tol * np.asarray(rsq).max())
    np.testing.assert_allclose(np.asarray(m), np.asarray(rm),
                               rtol=tol, atol=tol * sc)


@pytest.mark.parametrize("use_roll", [False, True])
@pytest.mark.parametrize("tile,relu", [(None, True), (16, False)])
def test_se_conv_vjp(use_roll, tile, relu):
    x, wm, s, t = _inputs(seed=3)
    spec = make_spec(8, 24, relu_out=relu, use_roll=use_roll,
                     interpret=True, tile=tile)
    tw = stored_width(spec)
    xs = jnp.pad(x, ((0, 0), (0, 0), (0, tw - 24), (0, 0)))

    rng = np.random.default_rng(9)
    ca = jnp.asarray(rng.normal(size=(2, 8, tw, LANES)).astype(np.float32))
    ca = ca.at[:, :, 24:, :].set(0.0)  # cotangents only in the true region
    cb = jnp.asarray(rng.normal(size=(1, LANES)).astype(np.float32))
    cc = jnp.asarray(rng.normal(size=(1, LANES)).astype(np.float32))
    cd = jnp.asarray(rng.normal(size=(2, LANES)).astype(np.float32))

    def loss(fn, x_, wm_, s_, t_):
        y, ssum, ssq, m = fn(x_, wm_, s_, t_, spec)
        return (jnp.vdot(y, ca) + jnp.vdot(ssum, cb)
                + jnp.vdot(ssq, cc) + jnp.vdot(m, cd))

    g_k = jax.grad(lambda *a: loss(se_conv, *a), argnums=(0, 1, 2, 3))(
        xs, wm, s, t)
    g_r = jax.grad(lambda *a: loss(_ref_se_conv, *a), argnums=(0, 1, 2, 3))(
        xs, wm, s, t)
    tol = 5e-2 if use_roll else 1e-3
    for name, a, b in zip(("dx", "dw", "ds", "dt"), g_k, g_r):
        a, b = np.asarray(a), np.asarray(b)
        if name == "dx":
            a, b = a[:, :, :24], b[:, :, :24]  # tail-col grads are unused
        sc = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol * sc,
                                   err_msg=name)


def _ref_stage1(y_stem, stem_bn, blocks, phases=4, eps=1e-5):
    """Unfused reference of the stage-1 chain (train-mode BN, matching
    models/resnetse.py SEBasicBlock on the packed layout)."""
    B, h2, w2, _ = y_stem.shape
    C = stem_bn[0].shape[0]

    def bn(x, gamma, beta):
        xr = x.reshape(-1, phases, C)
        mean = xr.mean(axis=(0, 1))
        var = ((xr - mean) ** 2).mean(axis=(0, 1))
        s = gamma * jax.lax.rsqrt(var + eps)
        t = beta - mean * s
        return x * jnp.tile(s, phases) + jnp.tile(t, phases), (mean, var)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x, stem_stats = bn(y_stem, *stem_bn)
    stats = {"stem": stem_stats}
    for bi, bp in enumerate(blocks):
        res = x
        out = jnp.maximum(conv(x, bp.conv1.reshape(3, 3, LANES, LANES)), 0.0)
        out, stats[f"b{bi}_bn1"] = bn(out, bp.bn1_gamma, bp.bn1_beta)
        out = conv(out, bp.conv2.reshape(3, 3, LANES, LANES))
        out, stats[f"b{bi}_bn2"] = bn(out, bp.bn2_gamma, bp.bn2_beta)
        pool = out.reshape(B, h2 * w2 * phases, C).mean(axis=1)
        gate = jax.nn.sigmoid(
            jnp.maximum(pool @ bp.fc1_w + bp.fc1_b, 0.0) @ bp.fc2_w
            + bp.fc2_b)
        out = out * jnp.tile(gate, (1, phases))[:, None, None, :]
        x = jax.nn.relu(out + res)
    return x, stats


def _stage1_params(C=32, seed=1):
    rng = np.random.default_rng(seed)

    def blk(i):
        return BlockParams(
            conv1=jnp.asarray((rng.normal(size=(3, 3, LANES, LANES)) * 0.05
                               ).astype(np.float32)),
            conv2=jnp.asarray((rng.normal(size=(3, 3, LANES, LANES)) * 0.05
                               ).astype(np.float32)),
            bn1_gamma=jnp.asarray(rng.uniform(0.8, 1.2, C).astype(np.float32)),
            bn1_beta=jnp.asarray((rng.normal(size=C) * 0.1).astype(np.float32)),
            bn2_gamma=jnp.asarray(rng.uniform(0.8, 1.2, C).astype(np.float32)),
            bn2_beta=jnp.asarray((rng.normal(size=C) * 0.1).astype(np.float32)),
            fc1_w=jnp.asarray((rng.normal(size=(C, C // 8)) * 0.3
                               ).astype(np.float32)),
            fc1_b=jnp.asarray(np.zeros(C // 8, np.float32)),
            fc2_w=jnp.asarray((rng.normal(size=(C // 8, C)) * 0.3
                               ).astype(np.float32)),
            fc2_b=jnp.asarray(np.zeros(C, np.float32)),
        )

    stem_bn = (jnp.asarray(rng.uniform(0.8, 1.2, C).astype(np.float32)),
               jnp.asarray((rng.normal(size=C) * 0.1).astype(np.float32)))
    return stem_bn, [blk(i) for i in range(3)]


@pytest.mark.parametrize("tile", [None, 16])
def test_fused_stage1_forward_and_stats(tile):
    rng = np.random.default_rng(5)
    y_stem = jnp.asarray(np.maximum(
        rng.normal(size=(2, 8, 24, LANES)), 0.0).astype(np.float32))
    stem_bn, blocks = _stage1_params()

    out, stats = se_fused.fused_stage1(
        y_stem, stem_bn, blocks, train=True, interpret=True, tile=tile)
    rout, rstats = _ref_stage1(y_stem, stem_bn, blocks)

    np.testing.assert_allclose(np.asarray(out), np.asarray(rout),
                               rtol=1e-3, atol=1e-3)
    assert set(stats) == set(rstats)
    for k in stats:
        np.testing.assert_allclose(np.asarray(stats[k][0]),
                                   np.asarray(rstats[k][0]),
                                   rtol=1e-4, atol=1e-4, err_msg=f"{k} mean")
        np.testing.assert_allclose(np.asarray(stats[k][1]),
                                   np.asarray(rstats[k][1]),
                                   rtol=1e-3, atol=1e-4, err_msg=f"{k} var")


def test_fused_stage1_grads():
    rng = np.random.default_rng(6)
    y_stem = jnp.asarray(np.maximum(
        rng.normal(size=(2, 8, 24, LANES)), 0.0).astype(np.float32))
    stem_bn, blocks = _stage1_params(seed=2)
    tgt = jnp.asarray(rng.normal(size=(2, 8, 24, LANES)).astype(np.float32))

    def loss_fused(y_stem_, stem_bn_, blocks_):
        out, _ = se_fused.fused_stage1(y_stem_, stem_bn_, blocks_,
                                       train=True, interpret=True)
        return jnp.mean((out - tgt) ** 2)

    def loss_ref(y_stem_, stem_bn_, blocks_):
        out, _ = _ref_stage1(y_stem_, stem_bn_, blocks_)
        return jnp.mean((out - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(y_stem, stem_bn, blocks)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(y_stem, stem_bn, blocks)
    flat_f, _ = jax.tree_util.tree_flatten(gf)
    flat_r, tdef = jax.tree_util.tree_flatten(gr)
    paths = [str(p) for p, _ in jax.tree_util.tree_flatten_with_path(gr)[0]]
    for p, a, b in zip(paths, flat_f, flat_r):
        a, b = np.asarray(a), np.asarray(b)
        sc = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3 * sc,
                                   err_msg=p)


class TestModuleFusedParity:
    """ResNetSE34V2(fused_stage1=True) == the unfused packed path: same
    trees, same forward, same batch_stats updates, same gradients."""

    KW = dict(layers=(3, 1, 1, 1), num_filters=(32, 32, 64, 128), n_out=24,
              encoder_type="ASP", n_mels=16, log_input=False)

    def _models(self):
        from zerovox_tpu.models.resnetse import ResNetSE34V2
        return (ResNetSE34V2(**self.KW, packed_stages=1),
                ResNetSE34V2(**self.KW, packed_stages=1, fused_stage1=True))

    def _x(self, B=2, T=20, seed=0):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))

    def test_trees_identical(self):
        base, fused = self._models()
        x = self._x()
        v0 = base.init(jax.random.PRNGKey(0), x, train=True)
        v1 = fused.init(jax.random.PRNGKey(0), x, train=True)
        t0 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v0)
        t1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v1)
        assert t0 == t1
        for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("train", [False, True])
    def test_forward_and_stats_parity(self, train):
        base, fused = self._models()
        x = self._x(seed=1)
        v = base.init(jax.random.PRNGKey(1), x, train=True)
        y0, m0 = base.apply(v, x, train=train, mutable=["batch_stats"])
        y1, m1 = fused.apply(v, x, train=train, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=2e-4, atol=2e-4)
        f0 = jax.tree_util.tree_leaves_with_path(m0["batch_stats"])
        f1 = jax.tree_util.tree_leaves_with_path(m1["batch_stats"])
        for (p0, a), (_, b) in zip(f0, f1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=str(p0))

    def test_grad_parity(self):
        base, fused = self._models()
        x = self._x(seed=2)
        v = base.init(jax.random.PRNGKey(2), x, train=True)
        tgt = np.random.default_rng(4).normal(size=(2, 1, 24)).astype(
            np.float32)

        def loss(model, params):
            out, _ = model.apply({"params": params,
                                  "batch_stats": v["batch_stats"]},
                                 x, train=True, mutable=["batch_stats"])
            return jnp.mean((out - tgt) ** 2)

        g0 = jax.grad(lambda p: loss(base, p))(v["params"])
        g1 = jax.grad(lambda p: loss(fused, p))(v["params"])
        f0 = jax.tree_util.tree_leaves_with_path(g0)
        f1 = jax.tree_util.tree_leaves_with_path(g1)
        for (p0, a), (_, b) in zip(f0, f1):
            a, b = np.asarray(a), np.asarray(b)
            # atol floor of 1e-6: leaves with ~1e-9 reference grads (e.g.
            # att_bn.bias, whose grad cancels to float noise) are noise-level
            sc = max(np.abs(b).max(), 5e-4)
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3 * sc,
                                       err_msg=str(p0))


def test_bwd_retile_matches_spec_width():
    """The backward re-tiles wide single-window specs (tile > 96) to fit
    the 16 MiB scoped-VMEM stack (measured OOM at tile=176, h2=40 on v5e).
    The derived spec must preserve stored width exactly."""
    from zerovox_tpu.ops.pallas.se_fused import _bwd_spec
    spec = make_spec(40, 172, relu_out=True, use_roll=False, interpret=True)
    assert (spec.tile, spec.nw) == (176, 1)
    b = _bwd_spec(spec)
    assert (b.tile, b.nw) == (88, 2)
    assert stored_width(b) == stored_width(spec)
    # tile <= 96 passes through untouched
    small = make_spec(8, 24, relu_out=True, use_roll=False, interpret=True)
    assert _bwd_spec(small) is small


def test_se_conv_vjp_retiled_backward():
    """Gradient parity when forward runs single-window (tile=112) and the
    backward re-tiles to 2x56 — seam handling must not double-count wgrad."""
    x, wm, s, t = _inputs(B=1, h2=6, w2=108, seed=5)
    spec = make_spec(6, 108, relu_out=True, use_roll=False, interpret=True)
    assert spec.nw == 1 and spec.tile == 112
    from zerovox_tpu.ops.pallas.se_fused import _bwd_spec
    assert _bwd_spec(spec).nw > 1
    tw = stored_width(spec)
    xs = jnp.pad(x, ((0, 0), (0, 0), (0, tw - 108), (0, 0)))

    rng = np.random.default_rng(11)
    ca = jnp.asarray(rng.normal(size=(1, 6, tw, LANES)).astype(np.float32))
    ca = ca.at[:, :, 108:, :].set(0.0)
    cb = jnp.asarray(rng.normal(size=(1, LANES)).astype(np.float32))
    cc = jnp.asarray(rng.normal(size=(1, LANES)).astype(np.float32))
    cd = jnp.asarray(rng.normal(size=(1, LANES)).astype(np.float32))

    def loss(fn, x_, wm_, s_, t_):
        y, ssum, ssq, m = fn(x_, wm_, s_, t_, spec)
        return (jnp.vdot(y, ca) + jnp.vdot(ssum, cb)
                + jnp.vdot(ssq, cc) + jnp.vdot(m, cd))

    g_k = jax.grad(lambda *a: loss(se_conv, *a), argnums=(0, 1, 2, 3))(
        xs, wm, s, t)
    g_r = jax.grad(lambda *a: loss(_ref_se_conv, *a), argnums=(0, 1, 2, 3))(
        xs, wm, s, t)
    for name, a, b in zip(("dx", "dw", "ds", "dt"), g_k, g_r):
        a, b = np.asarray(a), np.asarray(b)
        if name == "dx":
            a, b = a[:, :, :108], b[:, :, :108]
        sc = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3 * sc,
                                   err_msg=name)


def test_se_conv_roll_bf16_inputs_staged_dma():
    """Roll formulation with bf16 arrays: the f32 windows cannot be DMA
    targets of bf16 HBM (tpu.enqueue_dma element-type mismatch on
    hardware), so a same-dtype staging window + VPU cast lands the data
    (se_fused._dma_window stage=). Covers fwd + vjp numerics of that path."""
    x, wm, s, t = _inputs(B=1, h2=8, w2=24, seed=7)
    spec = make_spec(8, 24, relu_out=True, use_roll=True, interpret=True)
    tw = stored_width(spec)
    xs = jnp.pad(x, ((0, 0), (0, 0), (0, tw - 24), (0, 0))).astype(jnp.bfloat16)
    wmh = wm.astype(jnp.bfloat16)

    y, ssum, ssq, m = se_conv(xs, wmh, s, t, spec)
    ry, rsum, rsq, rm = _ref_se_conv(xs.astype(jnp.float32), wm, s, t, spec)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ry),
                               rtol=6e-2, atol=6e-2)

    def loss(fn, x_, wm_):
        y_, s_, q_, m_ = fn(x_, wm_, s, t, spec)
        return (jnp.sum(y_.astype(jnp.float32)) + jnp.sum(s_)
                + jnp.sum(q_) + jnp.sum(m_))

    gk = jax.grad(lambda a, b: loss(se_conv, a, b), argnums=(0, 1))(xs, wmh)
    gr = jax.grad(lambda a, b: loss(_ref_se_conv, a, b), argnums=(0, 1))(
        xs.astype(jnp.float32), wm)
    for name, a, b in zip(("dx", "dw"), gk, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b)
        if name == "dx":
            a, b = a[:, :, :24], b[:, :, :24]
        sc = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=6e-2, atol=6e-2 * sc,
                                   err_msg=name)
