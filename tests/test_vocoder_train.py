"""In-repo HiFi-GAN vocoder training (training/vocoder.py, VERDICT r4 #2).

The reference never trains its vocoder (utils/export_hifigan.py only
exports a corpus for an external repo); these tests cover the new
capability end-to-end at test scale: dataset contract (preprocess-dir and
h5-dir), one-program GAN step (losses finite, mel loss falls), the
batched jitted log-mel matching the feature frontend, full-state
save/restore, and the trained generator loading back through
ZeroVoxTTS._load_meldec as a drop-in meldec.
"""

import json
import os

import numpy as np
import pytest

from zerovox_tpu.models.hifigan import HifiGanConfig
from zerovox_tpu.training.vocoder import (VocoderDataConfig, VocoderDataset,
                                          VocoderTrainer,
                                          VocoderTrainerConfig,
                                          make_batched_logmel)

SR = 16000
HOP = 16
FFT = 128
MELS = 20


def tiny_gcfg():
    return HifiGanConfig(
        resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=MELS, sampling_rate=SR)


def tiny_dcfg(segment_frames=8):
    return VocoderDataConfig(sampling_rate=SR, fft_size=FFT, hop_size=HOP,
                             win_length=FFT, num_mels=MELS, fmin=0.0,
                             fmax=SR / 2, segment_frames=segment_frames)


def _write_pp_dir(root, n_items=4, n_frames=40, start_hop=3, rng=None):
    """Fabricate the preprocess on-disk contract: wav frame t of
    mel-{base}.npy covers wavs/{base}.wav[(start_hop+t)*hop : +hop]."""
    rng = rng or np.random.default_rng(0)
    from zerovox_tpu.dsp.audio import save_wav

    os.makedirs(os.path.join(root, "wavs"), exist_ok=True)
    os.makedirs(os.path.join(root, "mel"), exist_ok=True)
    lines = []
    for i in range(n_items):
        base = f"item{i}"
        t = np.arange((start_hop + n_frames) * HOP) / SR
        wav = (0.5 * np.sin(2 * np.pi * (220 + 40 * i) * t)).astype(np.float32)
        save_wav(os.path.join(root, "wavs", f"{base}.wav"), wav, SR)
        mel = rng.normal(size=(n_frames, MELS)).astype(np.float32)
        np.save(os.path.join(root, "mel", f"mel-{base}.npy"), mel)
        with open(os.path.join(root, "mel", f"startstop-{base}.json"), "w") as f:
            json.dump({"start_hop": start_hop,
                       "end_hop": start_hop + n_frames}, f)
        lines.append(f"{base}.wav|1,2|0,0|x")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_dataset_pp_dir_alignment(tmp_path):
    root = str(tmp_path / "pp")
    _write_pp_dir(root, n_items=3, n_frames=20, start_hop=5)
    ds = VocoderDataset([root], tiny_dcfg(segment_frames=8), seed=1)
    assert len(ds) == 3
    batch = next(ds.batches(4))  # wrap-pads 3 -> 4
    assert batch["mel"].shape == (4, 8, MELS)
    assert batch["wav"].shape == (4, 8 * HOP)
    # alignment: every wav segment must be a slice of the start_hop-cropped
    # source wav at a frame boundary
    from zerovox_tpu.dsp.audio import load_wav

    srcs = [load_wav(os.path.join(root, "wavs", f"item{i}.wav"),
                     target_sr=SR)[0][5 * HOP:] for i in range(3)]
    for j in range(4):
        seg = batch["wav"][j]
        ok = False
        for src in srcs:
            for t0 in range(0, 20 - 8 + 1):
                if np.allclose(seg, src[t0 * HOP:(t0 + 8) * HOP], atol=1e-6):
                    ok = True
        assert ok, f"segment {j} is not an aligned slice of any source wav"


def test_device_batches_match_host_batches(tmp_path):
    """device_batches must replay the host loader bit-exactly (shared
    _epoch_plan rng stream) — the loader-mode switch cannot perturb what
    a GAN run trains on."""
    root = str(tmp_path / "pp")
    _write_pp_dir(root, n_items=5, n_frames=24, start_hop=2)
    host = VocoderDataset([root], tiny_dcfg(segment_frames=8), seed=7)
    dev = VocoderDataset([root], tiny_dcfg(segment_frames=8), seed=7)
    for _ in range(2):  # two epochs: the stateful rng streams stay in step
        hb = list(host.batches(2))
        db = list(dev.device_batches(2))
        assert len(hb) == len(db) >= 2
        for h, d in zip(hb, db):
            np.testing.assert_array_equal(h["mel"], np.asarray(d["mel"]))
            np.testing.assert_array_equal(h["wav"], np.asarray(d["wav"]))


def test_dataset_h5_dir(tmp_path):
    h5py = pytest.importorskip("h5py")
    root = str(tmp_path / "h5")
    os.makedirs(root)
    rng = np.random.default_rng(0)
    with h5py.File(os.path.join(root, "a.h5"), "w") as h:
        h.create_dataset("feats", data=rng.normal(size=(30, MELS)))
        h.create_dataset("wave", data=rng.normal(size=(30 * HOP,)))
    ds = VocoderDataset([root], tiny_dcfg(segment_frames=8))
    assert len(ds) == 1
    batch = next(ds.batches(2))
    assert batch["mel"].shape == (2, 8, MELS)


def test_batched_logmel_matches_frontend():
    """The in-step mel loss must compare against the same transform the
    training features came from (dsp/mels.py / reference mels.py:357-395)."""
    from zerovox_tpu.dsp.mels import get_mel_from_wav

    dcfg = tiny_dcfg(segment_frames=16)
    rng = np.random.default_rng(3)
    wav = rng.uniform(-0.5, 0.5, 16 * HOP).astype(np.float32)
    got = np.asarray(make_batched_logmel(dcfg)(wav[None]))[0]  # [F, M]
    want, _ = get_mel_from_wav(audio=wav, sampling_rate=SR, fft_size=FFT,
                               hop_size=HOP, win_length=FFT, num_mels=MELS,
                               fmin=0.0, fmax=SR / 2)  # [M, T]
    assert got.shape[0] == want.shape[1] == 16
    np.testing.assert_allclose(got, want.T, atol=2e-4)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("voc")
    root = str(tmp / "pp")
    _write_pp_dir(root, n_items=4, n_frames=24)
    dcfg = tiny_dcfg(segment_frames=8)
    tcfg = VocoderTrainerConfig(
        max_epochs=8, batch_size=8, learning_rate=1e-3,
        out_folder=str(tmp / "out"), checkpoint_every_n_epochs=4,
        mpd_periods=(2, 3), msd_scales=2)
    ds = VocoderDataset([root], dcfg, seed=0)
    trainer = VocoderTrainer(tiny_gcfg(), dcfg, tcfg, steps_per_epoch=1)
    state = trainer.fit(ds, trainer.init_state())
    return tmp, trainer, state, ds


def test_gan_losses_finite_and_mel_falls(trained):
    tmp, trainer, state, _ = trained
    with open(os.path.join(trainer.tcfg.out_folder, "losses.json")) as f:
        hist = json.load(f)
    assert len(hist) == 8
    for row in hist:
        for k, v in row.items():
            assert np.isfinite(v), f"{k} not finite: {row}"
    # the 45x-weighted mel reconstruction must dominate and fall
    assert hist[-1]["g_mel"] < hist[0]["g_mel"]


def test_split_step_matches_fused(tmp_path):
    """--gan-step split must produce the same update trajectory as the
    fused single-program round (same math, same D-then-G order) — it only
    changes how the round is lowered for compilers that reject the fused
    graph."""
    import jax

    root = str(tmp_path / "pp")
    _write_pp_dir(root, n_items=4, n_frames=24)
    dcfg = tiny_dcfg(segment_frames=8)
    states, losses = [], []
    for split in (False, True):
        tcfg = VocoderTrainerConfig(
            max_epochs=1, batch_size=4, learning_rate=1e-3,
            out_folder=str(tmp_path / f"out{int(split)}"),
            mpd_periods=(2, 3), msd_scales=2, split_step=split)
        ds = VocoderDataset([root], dcfg, seed=0)
        trainer = VocoderTrainer(tiny_gcfg(), dcfg, tcfg, steps_per_epoch=1)
        state = trainer.init_state()
        batch = next(ds.batches(4))
        for _ in range(2):
            state, loss = trainer._step(state, batch)
        states.append(jax.device_get(state))
        losses.append({k: float(v) for k, v in jax.device_get(loss).items()})
    for k in losses[0]:
        np.testing.assert_allclose(losses[0][k], losses[1][k], rtol=1e-5,
                                   err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        states[0].g_params, states[1].g_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        states[0].d_params, states[1].d_params)
    assert int(states[1].step) == 2


def test_state_roundtrip(trained):
    import jax

    tmp, trainer, state, ds = trained
    ckpts = sorted(os.listdir(os.path.join(trainer.tcfg.out_folder,
                                           "checkpoints")))
    assert any(c.endswith("0007.msgpack") for c in ckpts)
    path = os.path.join(trainer.tcfg.out_folder, "checkpoints",
                        "vocoder-0007.msgpack")
    restored = trainer.restore_state(trainer.init_state(), path)
    a = jax.device_get(state)
    b = jax.device_get(restored)
    assert int(b.step) == int(a.step)
    jax.tree.map(np.testing.assert_array_equal, a.g_params, b.g_params)
    jax.tree.map(np.testing.assert_array_equal, a.d_opt, b.d_opt)


def test_trained_generator_is_dropin_meldec(trained):
    """generator.msgpack + config.json must load via the synthesis stack's
    meldec loader and vocode mels at the right length."""
    import jax

    from zerovox_tpu.models.hifigan import MelDec
    from zerovox_tpu.synthesize import ZeroVoxTTS

    tmp, trainer, state, _ = trained
    out = trainer.tcfg.out_folder
    assert os.path.exists(os.path.join(out, "generator.msgpack"))
    meldec_cfg, meldec_vars = ZeroVoxTTS._load_meldec(out, verbose=True)
    assert meldec_cfg.num_mels == MELS
    md = MelDec(meldec_cfg)
    mel = np.zeros((1, 12, MELS), np.float32)
    wav = np.asarray(md.apply(meldec_vars, mel, normalize_before=True))
    assert wav.shape == (1, 12 * HOP)
    # and the params are the trained ones, not an init
    got = meldec_vars["params"]["generator"]
    want = jax.device_get(state.g_params)
    np.testing.assert_array_equal(
        got["conv_pre"]["kernel"], want["conv_pre"]["kernel"])
