"""Data-parallel batch serving over a device mesh.

`ZeroVoxTTS(..., mesh=)` replicates model params over a jax Mesh with a
"data" axis and shards `tts_batch`'s utterance rows across it: XLA SPMD
runs each shard's encode/decode/vocode on its own device over ICI, results
gather on the host fetch. Runs here on the virtual 8-device CPU mesh
(SURVEY.md §4 test strategy); on hardware, the same code serves a batch
across a v5e slice. The reference has no serving parallelism at all
(single process, single device — zerovox/tts/synthesize.py)."""

import jax
import numpy as np
import pytest

from test_synthesize import SMALL_MELDEC, small_cfg

from zerovox_tpu.parallel.mesh import MeshConfig, make_mesh
from zerovox_tpu.synthesize import ZeroVoxTTS

TEXTS = [
    "hello world",
    "the quick brown fox jumps over the lazy dog",
    "mesh parallel batch serving",
    "four utterances in flight",
    "and a fifth odd one",
]


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])


@pytest.fixture(scope="module")
def synth_single():
    return ZeroVoxTTS.from_random(small_cfg(), SMALL_MELDEC, seed=0)


@pytest.fixture(scope="module")
def synth_mesh(mesh):
    return ZeroVoxTTS.from_random(small_cfg(), SMALL_MELDEC, seed=0, mesh=mesh)


def _spkembs(synth, n):
    rng = np.random.default_rng(1)
    e = rng.normal(size=(n, 1, synth.cfg.model.emb_size)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


class TestMeshServing:
    def test_requires_data_axis(self):
        from jax.sharding import Mesh

        bad = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
        with pytest.raises(ValueError, match="data"):
            ZeroVoxTTS.from_random(small_cfg(), SMALL_MELDEC, mesh=bad)

    def test_batch_matches_single_device(self, synth_single, synth_mesh):
        """Row-sharded serving is the same computation per row — outputs
        must match the unsharded engine (same seed => identical weights)."""
        texts = TEXTS[:4]
        embs = _spkembs(synth_single, 4)
        out0 = synth_single.tts_batch(texts, embs)
        out1 = synth_mesh.tts_batch(texts, embs)
        assert [n for _, n in out0] == [n for _, n in out1]
        for (w0, _), (w1, _) in zip(out0, out1):
            np.testing.assert_allclose(w0, w1, atol=2e-5)

    def test_ragged_batch_pads_rows(self, synth_single, synth_mesh):
        """B=5 on an 8-way mesh: rows pad to 8 internally, caller sees 5."""
        embs = _spkembs(synth_single, 5)
        out = synth_mesh.tts_batch(TEXTS, embs)
        assert len(out) == 5
        ref = synth_single.tts_batch(TEXTS, embs)
        for (w0, n0), (w1, n1) in zip(ref, out):
            assert n0 == n1
            np.testing.assert_allclose(w0, w1, atol=2e-5)

    def test_forced_durations_on_mesh(self, synth_single, synth_mesh):
        texts = TEXTS[:3]
        embs = _spkembs(synth_single, 3)
        durs = []
        for t in texts:
            ids, _ = synth_single.text2phonemeids(t)
            durs.append(np.full(len(ids), 3, np.int32))
        out0 = synth_single.tts_batch(texts, embs, durations=durs)
        out1 = synth_mesh.tts_batch(texts, embs, durations=durs)
        assert len(out1) == 3
        for (w0, n0), (w1, n1) in zip(out0, out1):
            assert n0 == n1
            np.testing.assert_allclose(w0, w1, atol=2e-5)

    def test_single_utterance_path_unaffected(self, synth_mesh):
        emb = _spkembs(synth_mesh, 1)
        wav, _, n = synth_mesh.tts("hello mesh", emb)
        assert n >= 1
        assert wav.shape[0] == n * synth_mesh.cfg.audio.hop_size
