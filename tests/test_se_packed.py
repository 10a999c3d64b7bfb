"""Packed (2x2 space-to-depth) speaker-encoder stage-1 == unpacked, exactly.

The packed path (models/resnetse.py `packed_stages`, plumbed from
ModelConfig.packed_speaker / `zerovox-train --packed-speaker`) re-expresses
the stride-1 C=32 SE-ResNet blocks on a [H/2, W/2, 4C] lane-packed layout:
the conv kernels actually convolved are a fixed phase-structured
rearrangement of the canonical [3,3,C,C] parameters, BatchNorm statistics
reduce over the phase axis, and the SE squeeze averages over phases. Same
math, same parameter / batch_stats trees, checkpoint-interchangeable.
Roofline rationale: scripts/exp_se_packed.py, docs/PERFORMANCE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zerovox_tpu.models.resnetse import ResNetSE34V2, _pack2x2, _unpack2x2

LAYERS = (2, 1, 1, 1)
FILTERS = (8, 16, 32, 64)
N_MELS = 16


def _models(packed_stages=1, packed_stem=False):
    kw = dict(layers=LAYERS, num_filters=FILTERS, n_out=24,
              encoder_type="ASP", n_mels=N_MELS, log_input=False)
    return (ResNetSE34V2(**kw, packed_stages=0),
            ResNetSE34V2(**kw, packed_stages=packed_stages,
                         packed_stem=packed_stem))


def _init(model, T=20, B=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, T, N_MELS)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(seed), x, train=True)
    return x, variables


class TestPackedSpeakerEncoder:
    def test_pack_roundtrip(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 6, 8, 5)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(_unpack2x2(_pack2x2(x))),
                                      np.asarray(x))

    @pytest.mark.parametrize("stages", [1, 2])
    def test_trees_identical(self, stages):
        base, packed = _models(stages)
        _, v0 = _init(base)
        _, v1 = _init(packed)
        t0 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v0)
        t1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v1)
        assert t0 == t1

    @pytest.mark.parametrize("train", [False, True])
    @pytest.mark.parametrize("stages", [1, 2])
    @pytest.mark.parametrize("stem", [False, True])
    def test_forward_parity(self, train, stages, stem):
        base, packed = _models(stages, packed_stem=stem)
        x, variables = _init(base)
        kw = dict(train=train)
        if train:
            y0, m0 = base.apply(variables, x, mutable=["batch_stats"], **kw)
            y1, m1 = packed.apply(variables, x, mutable=["batch_stats"], **kw)
            # running-stat updates must match too (stats reduce over phases)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-5),
                m0["batch_stats"], m1["batch_stats"])
        else:
            y0 = base.apply(variables, x, **kw)
            y1 = packed.apply(variables, x, **kw)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)

    @pytest.mark.parametrize("stages", [1, 2])
    @pytest.mark.parametrize("stem", [False, True])
    def test_grad_parity(self, stages, stem):
        base, packed = _models(stages, packed_stem=stem)
        x, variables = _init(base)
        params, stats = variables["params"], variables["batch_stats"]

        def loss(model, p):
            out, _ = model.apply({"params": p, "batch_stats": stats}, x,
                                 train=True, mutable=["batch_stats"])
            return (out * jnp.arange(out.shape[-1])).sum()

        g0 = jax.grad(lambda p: loss(base, p))(params)
        g1 = jax.grad(lambda p: loss(packed, p))(params)
        # Identical math, different reduction order. In f64 every leaf
        # matches to <1e-12 of its own magnitude except att_bn.bias and
        # att_conv2.bias, whose TRUE gradients are exactly zero (they shift
        # the attention logits uniformly along time; softmax is
        # shift-invariant) — both variants return cancellation noise there.
        # So compare per leaf at a tolerance scaled to that leaf's own
        # gradient magnitude (f32 reassociation noise amplifies through the
        # BN/instance-norm rsqrt chains).
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            a, b = np.asarray(a), np.asarray(b)
            tol = 3e-3 * (1.0 + float(np.max(np.abs(a))))
            np.testing.assert_allclose(a, b, atol=tol)

    def test_odd_width_falls_back(self):
        """Odd time dim (inference-only shapes) silently uses the unpacked
        path — identical output, no shape error."""
        base, packed = _models()
        x, variables = _init(base, T=21)
        y0 = base.apply(variables, x)
        y1 = packed.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)

    def test_stage2_stops_extending_on_odd_packed_dims(self):
        """packed_stages=2 with stage-1 packed dims odd: the region stops
        after stage 1 (unpack before stage 2) — identical output."""
        base, packed = _models(2)
        # T=22 -> packed W2=11 odd: stage-2 extension must be declined
        x, variables = _init(base, T=22)
        y0 = base.apply(variables, x)
        y1 = packed.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)
