"""Preprocessing tests: CTC forced alignment correctness, and the full
offline pipeline (align -> features -> stats) on a synthetic LJSpeech corpus."""

import json
import os

import numpy as np
import pytest
import yaml

from zerovox_tpu.preprocess.ctc_align import forced_align, forced_align_jax, merge_tokens


def make_emissions(path, C, sharp=8.0):
    """Emission matrix strongly preferring class path[t] at frame t."""
    T = len(path)
    logits = np.full((T, C), -sharp)
    logits[np.arange(T), path] = sharp
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


class TestForcedAlign:
    def test_recovers_known_path(self):
        # true framewise path: blanks around tokens 1,2,3
        path = [0, 1, 1, 0, 2, 2, 2, 0, 3, 0]
        emissions = make_emissions(path, C=5)
        aligned, scores = forced_align(emissions, np.array([1, 2, 3]))
        np.testing.assert_array_equal(aligned, path)
        assert np.all(scores <= 0)

    def test_repeated_tokens_need_blank(self):
        # targets [1, 1]: CTC requires a blank between the two occurrences
        path = [1, 1, 0, 1, 1]
        emissions = make_emissions(path, C=3)
        aligned, _ = forced_align(emissions, np.array([1, 1]))
        np.testing.assert_array_equal(aligned, path)

    def test_too_many_targets_raises(self):
        emissions = make_emissions([1, 2], C=4)
        with pytest.raises(ValueError):
            forced_align(emissions, np.array([1, 2, 3]))

    def test_empty_targets(self):
        emissions = make_emissions([0, 0, 0], C=3)
        aligned, _ = forced_align(emissions, np.array([], dtype=np.int64))
        np.testing.assert_array_equal(aligned, [0, 0, 0])

    def test_path_is_valid_on_noisy_emissions(self):
        rng = np.random.default_rng(3)
        T, C = 60, 8
        logits = rng.normal(size=(T, C))
        emissions = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        targets = np.array([3, 1, 4, 1, 5])
        aligned, _ = forced_align(emissions, targets)
        # collapsing the framewise path must reproduce the target sequence
        collapsed = [t for t in aligned if t != 0]
        dedup = [t for i, t in enumerate(collapsed) if i == 0 or collapsed[i] != collapsed[i - 1]]
        # handle repeated targets separated by blanks
        spans = merge_tokens(aligned, np.zeros(T, np.float32))
        np.testing.assert_array_equal([s.token for s in spans], targets)
        # spans are ordered and non-overlapping
        for a, b in zip(spans, spans[1:]):
            assert a.end <= b.start

    def test_jax_variant_matches_numpy(self):
        rng = np.random.default_rng(4)
        T, C = 40, 6
        logits = rng.normal(size=(T, C))
        emissions = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        targets = np.array([2, 3, 1])
        a_np, s_np = forced_align(emissions, targets)
        a_jx, s_jx = forced_align_jax(emissions.astype(np.float32), targets)
        np.testing.assert_array_equal(np.asarray(a_jx), a_np)
        np.testing.assert_allclose(np.asarray(s_jx), s_np, atol=1e-5)

    def test_merge_tokens_scores(self):
        aligned = np.array([0, 2, 2, 0, 5])
        scores = np.array([-1.0, -0.2, -0.4, -1.0, -0.1], np.float32)
        spans = merge_tokens(aligned, scores)
        assert len(spans) == 2
        assert spans[0].token == 2 and spans[0].start == 1 and spans[0].end == 3
        np.testing.assert_allclose(spans[0].score, -0.3, atol=1e-6)


@pytest.fixture(scope="module")
def lj_corpus(tmp_path_factory):
    """Synthetic LJSpeech-format corpus: modulated-noise wavs + metadata.csv."""
    from zerovox_tpu.dsp.audio import save_wav

    root = tmp_path_factory.mktemp("ljcorpus")
    wavdir = root / "wavs"
    os.makedirs(wavdir)

    rng = np.random.default_rng(0)
    sr = 22050
    texts = [
        "hello world this is a test",
        "the quick brown fox jumps over the lazy dog",
        "speech synthesis on tensor processing units",
    ]
    lines = []
    for i, text in enumerate(texts):
        base = f"sample{i:02d}"
        dur_s = 2.0 + 0.5 * i
        n = int(sr * dur_s)
        # speech-like: noise bursts with silence at the edges
        wav = rng.normal(size=n).astype(np.float32) * 0.1
        env = np.clip(np.sin(np.linspace(0, np.pi, n)) * 1.2, 0, 1)
        wav *= env
        # add voiced component so F0 estimation finds something
        t = np.arange(n) / sr
        wav += 0.15 * np.sin(2 * np.pi * 150 * t).astype(np.float32) * env
        save_wav(wavdir / f"{base}.wav", wav, sr)
        lines.append(f"{base}|{text}")

    with open(root / "metadata.csv", "w") as f:
        f.write("\n".join(lines) + "\n")
    return str(root)


class TestAlignmentPaddingClamp:
    """Regression: batch emissions are zero-padded to the longest wav; a
    bad transcript can make Viterbi place trailing tokens in the padding.
    Such samples must be dropped, not written with spans beyond the true
    wav end (first observed on self-labeled real speech,
    scripts/exp_real_speech.py)."""

    def _pre(self):
        from zerovox_tpu.preprocess.aligner import EnergyPseudoAligner
        from zerovox_tpu.preprocess.pipeline import Preprocessor

        modelcfg = {
            "audio": {"sampling_rate": 22050, "hop_size": 256,
                      "fft_size": 1024, "win_length": 1024, "num_mels": 80,
                      "fmin": 0, "fmax": 8000},
            "model": {"max_txt_len": 512, "min_mel_len": 1, "max_mel_len": 1750,
                      "phones": "'-abcdefghijklmnopqrstuvwxyz",
                      "puncts": " ,.;:-!?\""},
        }
        al = EnergyPseudoAligner()
        return Preprocessor(modelcfg, "en", min_avg_score=0.0, aligner=al), al

    def _emission(self, al, frames_ab, T):
        d = al.dictionary
        path = [al.blank] * T
        for t, c in frames_ab:
            path[t] = d[c]
        em = np.full((T, len(al.labels)), -12.0, np.float32)
        em[np.arange(T), path] = -0.01
        return em - np.log(np.exp(em).sum(-1, keepdims=True))

    def test_span_in_padding_drops_sample(self):
        pre, al = self._pre()
        n_true = 10  # true wav frames; emission padded to 20
        audio = np.ones(n_true * al.hop_size, np.float32) * 0.1
        job = {"wav_path": "x.wav", "transcript_uroman": "ab",
               "transcript_normalized": "ab", "base_name": "x"}
        em = self._emission(al, [(2, "a"), (16, "b")], T=20)
        assert pre._align_one(em, job, audio) is None

    def test_span_inside_wav_is_kept(self):
        pre, al = self._pre()
        n_true = 10
        audio = np.ones(n_true * al.hop_size, np.float32) * 0.1
        job = {"wav_path": "x.wav", "transcript_uroman": "ab",
               "transcript_normalized": "ab", "base_name": "x"}
        em = self._emission(al, [(2, "a"), (7, "b")], T=20)
        res = pre._align_one(em, job, audio)
        assert res is not None
        assert sum(res.durations) == res.end_hop - res.start_hop


class TestPipelineEndToEnd:
    def test_full_preprocess(self, lj_corpus, tmp_path, monkeypatch):
        out_base = tmp_path / "preprocessed"
        os.makedirs(out_base)
        monkeypatch.setenv("ZEROVOX_PREPROCESSED_DATA_PATH", str(out_base))

        modelcfg = {
            "audio": {"sampling_rate": 22050, "fft_size": 1024, "hop_size": 256,
                      "win_length": 1024, "num_mels": 80, "fmin": 0, "fmax": 8000},
            "model": {"max_txt_len": 512, "min_mel_len": 50, "max_mel_len": 1750,
                      "phones": "'-abcdefghijklmnopqrstuvwxyz", "puncts": " ,.;:-!?\""},
        }
        corpus_cfg = {"dataset": "LJSpeech", "language": "en",
                      "path": {"corpus_path": lj_corpus, "preprocessed_path": "tc"}}

        mc_path = tmp_path / "modelcfg.yaml"
        cc_path = tmp_path / "corpus.yaml"
        with open(mc_path, "w") as f:
            yaml.dump(modelcfg, f)
        with open(cc_path, "w") as f:
            yaml.dump(corpus_cfg, f)

        from zerovox_tpu.cli.preprocess import main

        main([str(mc_path), str(cc_path), "--aligner", "pseudo",
              "-m", "0.3", "-b", "2"])

        out = out_base / "tc"
        assert (out / "train.txt").exists()
        with open(out / "train.txt") as f:
            train_lines = [l for l in f.read().splitlines() if l]
        assert len(train_lines) >= 2  # most samples survive

        # feature files consistent with the reference on-disk contract
        for line in train_lines:
            wav, phones, puncts, text = line.split("|")
            base = os.path.splitext(wav)[0]
            durations = np.load(out / "duration" / f"duration-{base}.npy")
            mel = np.load(out / "mel" / f"mel-{base}.npy")
            pitch = np.load(out / "pitch" / f"pitch-{base}.npy")
            energy = np.load(out / "energy" / f"energy-{base}.npy")
            assert durations.sum() == mel.shape[0]
            assert mel.shape[1] == 80
            assert len(durations) == len(phones.split(",")) == len(puncts.split(","))
            assert len(pitch) == len(energy) == len(durations)
            assert (out / "mel" / f"startstop-{base}.json").exists()
            assert (out / "wavs" / (wav + ".txt")).exists()  # label file

        with open(out / "stats.json") as f:
            stats = json.load(f)
        assert stats["pitch"][0] < stats["pitch"][1]
        assert stats["energy"][0] < stats["energy"][1]

    def test_preprocessed_corpus_feeds_datamodule(self, lj_corpus, tmp_path, monkeypatch):
        """The preprocessor's output must be loadable by the training pipeline."""
        out_base = tmp_path / "pp2"
        os.makedirs(out_base)
        monkeypatch.setenv("ZEROVOX_PREPROCESSED_DATA_PATH", str(out_base))

        modelcfg = {
            "audio": {"sampling_rate": 22050, "fft_size": 1024, "hop_size": 256,
                      "win_length": 1024, "num_mels": 80, "fmin": 0, "fmax": 8000},
            "model": {"max_txt_len": 512, "min_mel_len": 50, "max_mel_len": 1750,
                      "phones": "'-abcdefghijklmnopqrstuvwxyz", "puncts": " ,.;:-!?\""},
        }
        corpus_cfg = {"dataset": "LJSpeech", "language": "en",
                      "path": {"corpus_path": lj_corpus, "preprocessed_path": "tc2"}}
        mc_path = tmp_path / "modelcfg.yaml"
        cc_path = tmp_path / "corpus.yaml"
        with open(mc_path, "w") as f:
            yaml.dump(modelcfg, f)
        with open(cc_path, "w") as f:
            yaml.dump(corpus_cfg, f)

        from zerovox_tpu.cli.preprocess import main

        main([str(mc_path), str(cc_path), "--aligner", "pseudo", "-m", "0.3"])

        with open(out_base / "tc2" / "stats.json") as f:
            s = json.load(f)
        from zerovox_tpu.symbols import Symbols
        from zerovox_tpu.training.data import SpeechDataModule

        dm = SpeechDataModule(
            [corpus_cfg], Symbols("'-abcdefghijklmnopqrstuvwxyz", " ,.;:-!?\""),
            stats={"pitch_min": s["pitch"][0], "pitch_max": s["pitch"][1],
                   "energy_min": s["energy"][0], "energy_max": s["energy"][1]},
            batch_size=2, num_workers=1, base_path=str(out_base), ref_mel_len=64,
        )
        dm.prepare_data()
        assert len(dm.train_dataset) >= 2
        x, y = next(iter(dm.train_dataloader()))
        assert x["phoneme"].shape[0] == 2
        assert np.isfinite(y["mel"]).all()


class TestNativeAligner:
    def test_native_matches_numpy(self):
        """C++ Viterbi vs the numpy DP on random emissions."""
        from zerovox_tpu import native
        from zerovox_tpu.preprocess import ctc_align

        lib = native.load("ctc_align")
        if lib is None:
            pytest.skip("no C++ toolchain available")

        rng = np.random.default_rng(9)
        for trial in range(5):
            T, C = int(rng.integers(30, 120)), 8
            logits = rng.normal(size=(T, C))
            emissions = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
            targets = rng.integers(1, C, size=rng.integers(1, T // 4))

            a_nat, s_nat = ctc_align._native_forced_align(emissions, targets, 0)
            # force the numpy path by calling internals
            import zerovox_tpu.preprocess.ctc_align as ca
            orig = ca._native_forced_align
            ca._native_forced_align = lambda *a, **k: None
            try:
                a_np, s_np = ca.forced_align(emissions, targets, 0)
            finally:
                ca._native_forced_align = orig

            np.testing.assert_array_equal(a_nat, a_np)
            np.testing.assert_allclose(s_nat, s_np, atol=1e-5)

    def test_native_too_long_raises(self):
        from zerovox_tpu import native
        from zerovox_tpu.preprocess.ctc_align import forced_align

        if native.load("ctc_align") is None:
            pytest.skip("no C++ toolchain available")
        emissions = np.zeros((2, 4))
        with pytest.raises(ValueError):
            forced_align(emissions, np.array([1, 2, 3]))
