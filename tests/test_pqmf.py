"""PQMF filter bank tests: near-perfect reconstruction."""

import numpy as np

from zerovox_tpu.ops.pqmf import PQMF


class TestPQMF:
    def test_reconstruction(self):
        pqmf = PQMF(subbands=4)
        rng = np.random.default_rng(0)
        sr = 16000
        t = np.arange(sr) / sr
        x = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1830 * t)).astype(np.float32)
        x = x[None, : (len(x) // 4) * 4]

        bands = pqmf.analysis(x)
        assert bands.shape == (1, x.shape[1] // 4, 4)
        y = np.asarray(pqmf.synthesis(bands))

        # near-perfect reconstruction up to group delay
        delay = 62  # taps
        a = x[0, delay:-delay]
        b = y[0, delay:-delay]
        n = min(len(a), len(b))
        # align by cross-correlation peak within +-taps
        corr = np.correlate(b[: n // 2], a[: n // 2 - 128], mode="valid")
        off = int(np.argmax(corr))
        a2 = a[: n // 2 - 128]
        b2 = b[off : off + len(a2)]
        err = np.sqrt(np.mean((a2 - b2) ** 2)) / np.sqrt(np.mean(a2**2))
        assert err < 0.05, f"reconstruction error {err}"

    def test_band_separation(self):
        """A low-frequency tone should land mostly in band 0."""
        pqmf = PQMF(subbands=4)
        sr = 16000
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * 300 * t).astype(np.float32)[None, :]
        bands = np.asarray(pqmf.analysis(x))
        energies = (bands**2).mean(axis=1)[0]
        assert np.argmax(energies) == 0
        assert energies[0] > 5 * energies[2]
