"""Fused ResBlock1 Pallas kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

from zerovox_tpu.ops.pallas.resblock import fused_resblock1, resblock1_reference


def _weights(rng, n_pairs, k, C):
    w1 = (rng.normal(size=(n_pairs, k, C, C)) * 0.05).astype(np.float32)
    b1 = (rng.normal(size=(n_pairs, C)) * 0.01).astype(np.float32)
    w2 = (rng.normal(size=(n_pairs, k, C, C)) * 0.05).astype(np.float32)
    b2 = (rng.normal(size=(n_pairs, C)) * 0.01).astype(np.float32)
    return w1, b1, w2, b2


class TestFusedResBlock:
    @pytest.mark.parametrize("k,dil", [(3, (1, 3, 5)), (7, (1, 3, 5)), (3, (1, 3))])
    def test_matches_reference(self, k, dil):
        rng = np.random.default_rng(0)
        T, C = 300, 16
        x = rng.normal(size=(T, C)).astype(np.float32)
        w1, b1, w2, b2 = _weights(rng, len(dil), k, C)

        ref = np.asarray(resblock1_reference(x, w1, b1, w2, b2, dil))
        out = np.asarray(fused_resblock1(x, w1, b1, w2, b2, dil, tile=128, interpret=True))
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_non_tile_multiple_length(self):
        rng = np.random.default_rng(1)
        T, C = 197, 8
        x = rng.normal(size=(T, C)).astype(np.float32)
        w1, b1, w2, b2 = _weights(rng, 3, 3, C)
        ref = np.asarray(resblock1_reference(x, w1, b1, w2, b2, (1, 3, 5)))
        out = np.asarray(fused_resblock1(x, w1, b1, w2, b2, (1, 3, 5), tile=64, interpret=True))
        np.testing.assert_allclose(out, ref, atol=2e-4)


class TestFusedMRF:
    """Fused multi-receptive-field stage (ops/pallas/mrf.py): mean of three
    ResBlock1 towers (kernel sizes 3/7/11) in one pass."""

    def test_matches_reference(self):
        from zerovox_tpu.ops.pallas.mrf import fused_mrf, mrf_reference

        rng = np.random.default_rng(2)
        T, C = 300, 16
        dil = (1, 3, 5)
        ksizes = (3, 7, 11)
        x = rng.normal(size=(T, C)).astype(np.float32)
        towers = [_weights(rng, len(dil), k, C) for k in ksizes]

        ref = np.asarray(mrf_reference(x, towers, dil))
        out = np.asarray(fused_mrf(x, towers, dil, ksizes, tile=128, interpret=True))
        np.testing.assert_allclose(out, ref, atol=3e-4)

    def test_non_tile_multiple_length(self):
        from zerovox_tpu.ops.pallas.mrf import fused_mrf, mrf_reference

        rng = np.random.default_rng(3)
        T, C = 211, 8
        dil = (1, 3)
        ksizes = (3, 7)
        x = rng.normal(size=(T, C)).astype(np.float32)
        towers = [_weights(rng, len(dil), k, C) for k in ksizes]
        ref = np.asarray(mrf_reference(x, towers, dil))
        out = np.asarray(fused_mrf(x, towers, dil, ksizes, tile=64, interpret=True))
        np.testing.assert_allclose(out, ref, atol=3e-4)


class TestBatchedResblock:
    def test_vmap_matches_per_item(self):
        """B>1 support: vmapped kernel equals the per-item kernel."""
        import jax

        from zerovox_tpu.ops.pallas.resblock import fused_resblock1

        rng = np.random.default_rng(4)
        B, T, C = 3, 200, 8
        x = rng.normal(size=(B, T, C)).astype(np.float32)
        w1, b1, w2, b2 = _weights(rng, 3, 3, C)
        f = lambda xb: fused_resblock1(xb, w1, b1, w2, b2, (1, 3, 5),
                                       tile=64, interpret=True)
        batched = np.asarray(jax.vmap(f)(x))
        for b in range(B):
            np.testing.assert_allclose(batched[b], np.asarray(f(x[b])), atol=1e-5)


class TestBf16Kernels:
    def test_fused_mrf_bf16_matches_f32(self):
        """bf16 inference feeds the kernels bf16 activations/weights; the
        kernel must accept them (bf16 DMA scratch, f32 accumulation, bf16
        store) and stay close to the f32 path."""
        import jax.numpy as jnp

        from zerovox_tpu.ops.pallas.mrf import fused_mrf, mrf_reference

        rng = np.random.default_rng(0)
        C, T = 64, 256
        x = rng.normal(size=(2, T, C)).astype(np.float32) * 0.3
        dil = (1, 3)
        towers = []
        for k in (3, 5):
            towers.append(tuple(
                jnp.asarray(a) for a in (
                    rng.normal(size=(len(dil), k, C, C)).astype(np.float32) * 0.05,
                    rng.normal(size=(len(dil), C)).astype(np.float32) * 0.01,
                    rng.normal(size=(len(dil), k, C, C)).astype(np.float32) * 0.05,
                    rng.normal(size=(len(dil), C)).astype(np.float32) * 0.01,
                )))

        ref = mrf_reference(jnp.asarray(x[0]), towers, dil)
        bf = fused_mrf(jnp.asarray(x).astype(jnp.bfloat16),
                       [tuple(a.astype(jnp.bfloat16) for a in t) for t in towers],
                       dil, (3, 5), tile=128, interpret=True)
        assert bf.dtype == jnp.bfloat16
        err = float(jnp.abs(bf[0].astype(jnp.float32) - ref).max())
        assert err < 0.05, err  # bf16 rounding envelope
