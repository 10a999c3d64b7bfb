"""Numerical parity of the FS2 stack vs the reference PyTorch implementation.

Random weights are initialized in torch, converted with zerovox_tpu.checkpoint,
and both frameworks run the same inputs in eval mode; outputs must agree to
f32 round-off (well inside the 1e-2 BASELINE target)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference

from zerovox_tpu.checkpoint import (
    _SD,
    convert_fs2_decoder,
    convert_fs2_encoder,
)
from zerovox_tpu.config import DecoderConfig, EncoderConfig, ModelConfig
from zerovox_tpu.models import fs2 as jfs2
from zerovox_tpu.ops.length_regulator import length_regulate
from zerovox_tpu.symbols import Symbols

fs2_ref, _, _, _ = load_reference()

ATOL = 2e-4

PHONES = "'-abcdefghijklmnopqrstuvwxyz"
PUNCTS = " ,.;:-!?\""


def small_model_cfg(decoder_kind="fastspeech2", scln=True):
    return ModelConfig(
        max_txt_len=64,
        max_mel_len=128,
        phones=PHONES,
        puncts=PUNCTS,
        emb_dim=48,
        punct_emb_dim=16,
        encoder=EncoderConfig(fs2_layer=2, fs2_head=2, fs2_dropout=0.0,
                              vp_filter_size=24, vp_kernel_size=3, vp_dropout=0.0,
                              ve_n_bins=32),
        decoder=DecoderConfig(kind=decoder_kind, n_layers=2, n_head=2,
                              conv_filter_size=96, conv_kernel_size=(9, 1),
                              dropout=0.0, scln=scln),
    )


@pytest.fixture(scope="module")
def torch_fs2_encoder():
    torch.manual_seed(0)
    syms = Symbols(PHONES, PUNCTS)
    cfg = small_model_cfg()
    ref = fs2_ref.FS2Encoder(
        symbols=syms,
        max_txt_len=cfg.max_txt_len,
        embed_dim=cfg.emb_dim,
        encoder_layer=cfg.encoder.fs2_layer,
        encoder_head=cfg.encoder.fs2_head,
        conv_filter_size=cfg.decoder.conv_filter_size,
        conv_kernel_size=list(cfg.decoder.conv_kernel_size),
        encoder_dropout=0.0,
        punct_embed_dim=cfg.punct_emb_dim,
        vp_filter_size=cfg.encoder.vp_filter_size,
        vp_kernel_size=cfg.encoder.vp_kernel_size,
        vp_dropout=0.0,
        ve_n_bins=cfg.encoder.ve_n_bins,
    )
    ref.eval()
    return ref, cfg


def _rand_inputs(rng, B, L, emb_size):
    phonemes = rng.integers(0, 28, size=(B, L)).astype(np.int32)
    puncts = rng.integers(0, 10, size=(B, L)).astype(np.int32)
    lens = np.array([L, L - 3])[:B]
    mask = np.arange(L)[None, :] >= lens[:, None]
    phonemes[mask] = 0
    puncts[mask] = 0
    style = rng.normal(size=(B, 1, emb_size)).astype(np.float32) * 0.1
    return phonemes, puncts, mask, style


class TestFS2EncoderParity:
    def test_inference_path(self, torch_fs2_encoder):
        ref, cfg = torch_fs2_encoder
        rng = np.random.default_rng(1)
        B, L = 2, 16
        phonemes, puncts, mask, style = _rand_inputs(rng, B, L, cfg.emb_size)

        with torch.no_grad():
            y_ref = ref(
                {"phoneme": torch.from_numpy(phonemes),
                 "puncts": torch.from_numpy(puncts),
                 "phoneme_mask": torch.from_numpy(mask)},
                style_embed=torch.from_numpy(style),
                train=False,
            )

        params = convert_fs2_encoder(_SD(ref.state_dict()), n_layers=cfg.encoder.fs2_layer)
        model = jfs2.FS2Encoder(cfg)
        T = int(y_ref["mel_len"].max().item())
        out = model.apply({"params": params}, phonemes, puncts, style,
                          max_mel_len=T, phoneme_mask=mask)

        np.testing.assert_allclose(np.asarray(out["log_duration"]),
                                   y_ref["log_duration"].numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(out["pitch"]),
                                   y_ref["pitch"].numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(out["energy"]),
                                   y_ref["energy"].numpy(), atol=ATOL)
        np.testing.assert_array_equal(np.asarray(out["mel_len"]),
                                      y_ref["mel_len"].numpy())
        np.testing.assert_allclose(np.asarray(out["features"]),
                                   y_ref["features"].numpy(), atol=ATOL)

    def test_teacher_forced_path(self, torch_fs2_encoder):
        ref, cfg = torch_fs2_encoder
        rng = np.random.default_rng(2)
        B, L = 2, 12
        phonemes, puncts, mask, style = _rand_inputs(rng, B, L, cfg.emb_size)
        pitch = rng.uniform(0, 1, size=(B, L)).astype(np.float32)
        energy = rng.uniform(0, 1, size=(B, L)).astype(np.float32)
        duration = rng.integers(1, 5, size=(B, L)).astype(np.int32)
        duration[mask] = 0
        mel_len = duration.sum(axis=1)
        T = int(mel_len.max())
        mel_mask = np.arange(T)[None, :] >= mel_len[:, None]

        ref.train()  # training path uses teacher targets; dropout rates are 0
        y_ref = ref(
            {"phoneme": torch.from_numpy(phonemes),
             "puncts": torch.from_numpy(puncts),
             "phoneme_mask": torch.from_numpy(mask),
             "pitch": torch.from_numpy(pitch),
             "energy": torch.from_numpy(energy),
             "duration": torch.from_numpy(duration),
             "mel_len": torch.from_numpy(mel_len),
             "mel_mask": torch.from_numpy(mel_mask)},
            style_embed=torch.from_numpy(style),
            train=True,
        )
        ref.eval()

        params = convert_fs2_encoder(_SD(ref.state_dict()), n_layers=cfg.encoder.fs2_layer)
        model = jfs2.FS2Encoder(cfg)
        out = model.apply({"params": params}, phonemes, puncts, style,
                          max_mel_len=T, phoneme_mask=mask,
                          pitch_target=pitch, energy_target=energy,
                          duration_target=duration, mel_mask=mel_mask)

        np.testing.assert_allclose(np.asarray(out["features"]).ravel(),
                                   y_ref["features"].detach().numpy().ravel(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(out["log_duration"]),
                                   y_ref["log_duration"].detach().numpy(), atol=ATOL)


class TestFS2DecoderParity:
    @pytest.mark.parametrize("scln", [True, False])
    def test_decoder(self, scln):
        torch.manual_seed(3)
        cfg = small_model_cfg(scln=scln)
        d = cfg.emb_size
        ref = fs2_ref.FS2Decoder(
            dec_max_seq_len=cfg.max_mel_len, dec_hidden=d,
            dec_n_layers=cfg.decoder.n_layers, dec_n_head=cfg.decoder.n_head,
            dec_conv_filter_size=cfg.decoder.conv_filter_size,
            dec_conv_kernel_size=list(cfg.decoder.conv_kernel_size),
            dec_dropout=0.0, dec_scln=scln, n_mel_channels=20, spk_emb_size=d,
        )
        ref.eval()

        rng = np.random.default_rng(4)
        B, T = 2, 40
        x = rng.normal(size=(B, T, d)).astype(np.float32)
        lens = np.array([T, T - 7])
        mask = np.arange(T)[None, :] >= lens[:, None]
        x[mask] = 0.0
        style = rng.normal(size=(B, 1, d)).astype(np.float32) * 0.1

        with torch.no_grad():
            mel_ref, _ = ref(torch.from_numpy(x), torch.from_numpy(mask),
                             spk_emb=torch.from_numpy(style))

        params = convert_fs2_decoder(_SD(ref.state_dict()), n_layers=cfg.decoder.n_layers, scln=scln)
        model = jfs2.FS2Decoder(dec_cfg=cfg.decoder, max_mel_len=cfg.max_mel_len, n_mels=20)
        mel = model.apply({"params": params}, x, mask, style)

        np.testing.assert_allclose(np.asarray(mel), mel_ref.numpy(), atol=ATOL)


class TestLengthRegulatorParity:
    def test_matches_reference_loop(self):
        lr_ref = fs2_ref.LengthRegulator()
        rng = np.random.default_rng(5)
        B, L, H = 3, 10, 8
        x = rng.normal(size=(B, L, H)).astype(np.float32)
        dur = rng.integers(0, 4, size=(B, L)).astype(np.int64)

        with torch.no_grad():
            out_ref, len_ref = lr_ref(torch.from_numpy(x), torch.from_numpy(dur), None)

        T = int(len_ref.max().item())
        frames, mel_len, mask = length_regulate(x, dur, T)

        np.testing.assert_array_equal(np.asarray(mel_len), len_ref.numpy())
        np.testing.assert_allclose(np.asarray(frames), out_ref.numpy(), atol=1e-6)

    def test_with_max_len_truncation(self):
        lr_ref = fs2_ref.LengthRegulator()
        rng = np.random.default_rng(6)
        x = rng.normal(size=(2, 6, 4)).astype(np.float32)
        dur = rng.integers(1, 5, size=(2, 6)).astype(np.int64)
        T = 8  # smaller than total durations

        with torch.no_grad():
            out_ref, _ = lr_ref(torch.from_numpy(x), torch.from_numpy(dur), T)

        frames, mel_len, _ = length_regulate(x, dur, T)
        np.testing.assert_allclose(np.asarray(frames), out_ref.numpy()[:, :T], atol=1e-6)
        assert np.all(np.asarray(mel_len) <= T)


class TestSinusoidTable:
    def test_matches_reference(self):
        ref_table = fs2_ref.get_sinusoid_encoding_table(65, 48).numpy()
        ours = jfs2.get_sinusoid_encoding_table(65, 48)
        np.testing.assert_allclose(ours, ref_table, atol=1e-6)
