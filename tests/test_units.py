"""Acoustic-unit self-labeling (preprocess/units.py + ClusterAligner).

The contract that makes self-labeled corpora trainable: the
pseudo-transcript produced by `transcribe` must FORCED-ALIGN against the
`ClusterAligner`'s emissions on the same wav with a high score, yielding
monotonic per-letter durations — because both are functions of the same
centroids. Validated on deterministic multi-tone synthetic audio.
"""

import numpy as np
import pytest

from zerovox_tpu.preprocess import units
from zerovox_tpu.preprocess.aligner import ClusterAligner, make_aligner
from zerovox_tpu.preprocess.ctc_align import forced_align, merge_tokens

SR = units.UNIT_SAMPLE_RATE


def _tone_seq(freqs, seg_s=0.25, gap_s=0.0, seed=0):
    rng = np.random.default_rng(seed)
    pieces = [np.zeros(int(0.3 * SR), np.float32)]
    for f in freqs:
        t = np.arange(int(seg_s * SR)) / SR
        seg = (0.4 * np.sin(2 * np.pi * f * t)
               + 0.1 * np.sin(4 * np.pi * f * t)).astype(np.float32)
        ramp = int(0.01 * SR)
        seg[:ramp] *= np.linspace(0, 1, ramp)
        seg[-ramp:] *= np.linspace(1, 0, ramp)
        pieces.append(seg)
        if gap_s:
            pieces.append(np.zeros(int(gap_s * SR), np.float32))
    pieces.append(np.zeros(int(0.3 * SR), np.float32))
    wav = np.concatenate(pieces)
    return wav + 1e-4 * rng.normal(size=wav.shape).astype(np.float32)


@pytest.fixture(scope="module")
def corpus():
    freq_bank = [220.0, 440.0, 880.0, 1760.0]
    rng = np.random.default_rng(7)
    wavs = [_tone_seq([freq_bank[i] for i in rng.integers(0, 4, size=6)],
                      seed=s) for s in range(6)]
    return wavs


@pytest.fixture(scope="module")
def centroids(corpus):
    feats = [units.unit_features(w)[0] for w in corpus]
    return units.fit_units(feats, k=8, seed=0, iters=15)


def test_fit_units_deterministic(corpus):
    feats = [units.unit_features(w)[0] for w in corpus]
    a = units.fit_units(feats, k=8, seed=0, iters=5)
    b = units.fit_units(feats, k=8, seed=0, iters=5)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8, units.UNIT_MELS)


def test_transcribe_collapses_and_is_consistent(corpus, centroids):
    texts = [units.transcribe(w, centroids) for w in corpus]
    for t in texts:
        assert len(t) >= 3
        assert set(t) <= set(units.UNIT_LETTERS + " ")
        # run-length collapsed: no immediate repeats
        assert all(a != b for a, b in zip(t, t[1:]) if a != " ")
    # distinct tone orders -> distinct transcripts
    assert len(set(texts)) > 1
    # same wav -> same transcript
    assert units.transcribe(corpus[0], centroids) == texts[0]


def test_cluster_aligner_force_aligns_own_transcript(tmp_path, corpus, centroids):
    units.save_units(str(tmp_path / "units.npz"), centroids)
    al = make_aligner(f"cluster:{tmp_path / 'units.npz'}")
    assert isinstance(al, ClusterAligner)
    assert al.sample_rate == SR and al.hop_size == units.UNIT_HOP

    wav = corpus[0]
    text = units.transcribe(wav, centroids).replace(" ", "")
    em = al.emissions(wav[None, : (len(wav) // al.hop_size) * al.hop_size])
    # emissions are normalized log-probs
    np.testing.assert_allclose(np.exp(em[0]).sum(-1), 1.0, atol=1e-4)

    targets = np.asarray([al.dictionary[c] for c in text], np.int64)
    aligned, scores = forced_align(em[0], targets, blank=al.blank)
    avg = float(np.mean(np.exp(scores)))
    assert avg > 0.9, f"self-alignment score {avg}"
    spans = merge_tokens(aligned, scores, blank=al.blank)
    assert len(spans) == len(targets)
    # spans are monotonic, non-empty
    for a, b in zip(spans, spans[1:]):
        assert a.end <= b.start + 1


def test_segment_wav_spans_cover_speech(corpus):
    wav = np.concatenate([corpus[0], corpus[1]])
    spans = units.segment_wav(wav, SR, min_s=1.0, max_s=3.0)
    assert spans, "no segments found"
    for s, e in spans:
        assert e - s >= int(0.4 * SR)
    # spans are ordered and non-overlapping
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2
