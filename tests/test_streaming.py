"""Chunked-streaming exactness at the vocoder level.

Regression coverage for the utterance-start boundary: halo-and-trim
streaming is only exact where the halo holds real mel context. At frame 0
an explicit zero halo is NOT equivalent to the full render's per-layer
implicit padding (conv biases make intermediates nonzero over a zero
prefix, and deeper layers read them), so the first window must anchor AT
mel[0] with no left halo (streaming.py ChunkStreamer.dispatch). The
end-to-end tests in test_synthesize.py hid this for fs2 because its
decoded mel opens near-silent; here the mel is random and loud at frame 0,
the adversarial case."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zerovox_tpu.models.hifigan import HifiGanConfig, MelDec
from zerovox_tpu.streaming import ChunkStreamer, stream_vocode

CFG = HifiGanConfig(
    resblock="1",
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3, 5),),
)


@pytest.fixture(scope="module")
def meldec():
    m = MelDec(CFG)
    mel = jnp.zeros((1, 8, 80), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), mel)
    return m, v


def _mel(T_bucket, mel_len, seed=0, loud_edges=True):
    rng = np.random.default_rng(seed)
    mel = rng.normal(size=(1, T_bucket, 80)).astype(np.float32)
    if loud_edges:
        mel[:, 0, :] *= 4.0  # adversarial: strong content AT the boundary
    mel[:, mel_len:, :] = 0.0  # decoder mask contract
    return jnp.asarray(mel)


@pytest.mark.parametrize("chunk", [16, 32])
def test_stream_matches_full_random_mel(meldec, chunk):
    m, v = meldec
    mel = _mel(64, 51)
    full = np.asarray(jax.jit(m.apply)(v, mel))[0, : 51 * CFG.total_upsample]
    chunks = list(stream_vocode(m, v, CFG, mel, 51, 256, chunk_frames=chunk))
    streamed = np.concatenate(chunks)
    assert len(streamed) == len(full)
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_stream_first_chunk_exact_at_loud_start(meldec):
    """The first chunk alone, against the full render's opening samples."""
    m, v = meldec
    mel = _mel(64, 51, seed=3)
    full = np.asarray(jax.jit(m.apply)(v, mel))[0]
    st = ChunkStreamer(m, v, CFG, mel, chunk_frames=32)
    w0 = st.trim(st.dispatch(0), 32, pos=0)
    np.testing.assert_allclose(w0, full[: 32 * CFG.total_upsample],
                               atol=1e-5)


def test_stream_short_utterance_single_chunk(meldec):
    m, v = meldec
    mel = _mel(64, 9, seed=5)
    full = np.asarray(jax.jit(m.apply)(v, mel))[0, : 9 * CFG.total_upsample]
    chunks = list(stream_vocode(m, v, CFG, mel, 9, 256, chunk_frames=32))
    streamed = np.concatenate(chunks)
    np.testing.assert_allclose(streamed, full, atol=1e-5)
