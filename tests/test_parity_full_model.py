"""Full composite-model parity: the reference ZeroVox (torch, lightning
stubbed) vs our JAX pipeline with converted weights — training forward and
the complete inference_ex text->waveform path (BASELINE.md: mel/waveform
within 1e-2 of the PyTorch reference; measured ~1e-4)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference, load_reference_model_module

from zerovox_tpu.checkpoint import convert_zerovox_state_dict, _SD, convert_hifigan_generator
from zerovox_tpu.config import ZeroVoxConfig
from zerovox_tpu.models.hifigan import Generator as JGenerator, HifiGanConfig
from zerovox_tpu.models.zerovox import ZeroVox as JZeroVox
from zerovox_tpu.ops.length_regulator import length_regulate
from zerovox_tpu.symbols import Symbols

fs2_ref, _, _, hifigan_ref = load_reference()
model_ref = load_reference_model_module()

PHONES = "'-abcdefghijklmnopqrstuvwxyz"
PUNCTS = " ,.;:-!?\""

CFG_DICT = {
    "audio": {"sampling_rate": 22050, "fft_size": 1024, "hop_size": 256,
              "win_length": 1024, "num_mels": 80, "fmin": 0, "fmax": 8000},
    "model": {
        "max_txt_len": 64, "min_mel_len": 10, "max_mel_len": 128,
        "phones": PHONES, "puncts": PUNCTS,
        "emb_dim": 112, "punct_emb_dim": 16,  # emb_size > n_mels (reference model.py:284 slices the mask to n_mels)
        "encoder": {"fs2_layer": 2, "fs2_head": 2, "fs2_dropout": 0.0,
                    "vp_filter_size": 16, "vp_kernel_size": 3, "vp_dropout": 0.0,
                    "ve_n_bins": 16},
        "decoder": {"kind": "fastspeech2", "n_layers": 2, "n_head": 2,
                    "conv_filter_size": 64, "conv_kernel_size": [9, 1],
                    "dropout": 0.0, "scln": True},
        "resnet": {"layers": [1, 1, 1, 1], "num_filters": [8, 8, 16, 16],
                   "encoder_type": "ASP"},
    },
    "training": {"learning_rate": 1e-4},
    "lang": ["en"],
}


class _AttrDict(dict):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.__dict__ = self


MELDEC_CONF = {
    "resblock": "2",
    "upsample_rates": [4, 4],
    "upsample_kernel_sizes": [8, 8],
    "upsample_initial_channel": 16,
    "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3]],
    "num_mels": 80,
    "sampling_rate": 22050,
}


@pytest.fixture(scope="module")
def ref_model():
    torch.manual_seed(99)
    syms = Symbols(PHONES, PUNCTS)
    m = CFG_DICT["model"]
    e, d, r = m["encoder"], m["decoder"], m["resnet"]
    model = model_ref.ZeroVox(
        symbols=syms, meldec_model=None,
        sampling_rate=22050, hop_length=256, n_mels=80,
        lr=1e-4, weight_decay=0.0, max_epochs=1, warmup_epochs=1,
        betas=[0.0, 0.99], eps=1e-9,
        embed_dim=m["emb_dim"], punct_embed_dim=m["punct_emb_dim"],
        dpe_embed_dim=32, emb_reduction=1,
        max_mel_len=m["max_mel_len"], max_txt_len=m["max_txt_len"],
        fs2enc_layer=e["fs2_layer"], fs2enc_head=e["fs2_head"],
        fs2enc_dropout=e["fs2_dropout"], vp_filter_size=e["vp_filter_size"],
        vp_kernel_size=e["vp_kernel_size"], vp_dropout=e["vp_dropout"],
        ve_n_bins=e["ve_n_bins"],
        resnet_layers=r["layers"], resnet_num_filters=r["num_filters"],
        resnet_encoder_type=r["encoder_type"],
        decoder_kind=d["kind"], decoder_n_layers=d["n_layers"],
        decoder_n_head=d["n_head"], decoder_conv_filter_size=d["conv_filter_size"],
        decoder_conv_kernel_size=d["conv_kernel_size"],
        decoder_dropout=d["dropout"], decoder_scln=d["scln"],
    )
    # attach a small vocoder the same way edit_meldec ships one
    gen = hifigan_ref.Generator(_AttrDict(dict(MELDEC_CONF)))
    gen.eval()
    gen.remove_weight_norm()
    model._meldec = gen
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(ref_model):
    cfg = ZeroVoxConfig.from_dict(CFG_DICT)
    sd = {k: v for k, v in ref_model.state_dict().items() if not k.startswith("_meldec.")}
    variables = convert_zerovox_state_dict(sd, cfg)
    meldec_sd = {k[len("_meldec."):]: v for k, v in ref_model.state_dict().items()
                 if k.startswith("_meldec.")}
    gen_params = convert_hifigan_generator(_SD(meldec_sd), HifiGanConfig.from_dict(MELDEC_CONF))
    return cfg, variables, gen_params


class TestFullModelParity:
    def test_inference_ex_waveform(self, ref_model, converted):
        cfg, variables, gen_params = converted
        rng = np.random.default_rng(0)
        n = 12
        phonemes = rng.integers(1, 28, size=(1, n)).astype(np.int32)
        puncts = rng.integers(0, 10, size=(1, n)).astype(np.int32)
        style = (rng.normal(size=(1, 1, cfg.model.emb_size)) * 0.1).astype(np.float32)

        with torch.no_grad():
            wav_ref, mel_len_ref, _, mel_ref = ref_model.inference_ex(
                {"phoneme": torch.from_numpy(phonemes), "puncts": torch.from_numpy(puncts),
                 "duration": None},
                style_embed=torch.from_numpy(style))

        model = JZeroVox(cfg)
        enc = model.apply(variables, phonemes, puncts, style, method=JZeroVox.encode)
        mel_len = int(np.asarray(enc["duration_rounded"]).sum())
        assert mel_len == int(mel_len_ref)

        T = 128  # any bucket >= mel_len
        mel, _, _ = model.apply(variables, enc["x"], enc["duration_rounded"], style, T,
                                method=JZeroVox.decode)
        gen = JGenerator(HifiGanConfig.from_dict(MELDEC_CONF))
        wav = gen.apply({"params": gen_params}, mel)

        wav_np = np.asarray(wav)[0, : mel_len * 256]
        np.testing.assert_allclose(
            np.asarray(mel)[0, :mel_len].T, mel_ref[:, :mel_len].numpy(), atol=1e-3)
        np.testing.assert_allclose(wav_np, wav_ref.numpy(), atol=1e-3)

    def test_training_forward(self, ref_model, converted):
        cfg, variables, _ = converted
        rng = np.random.default_rng(1)
        B, L = 2, 10
        dur = rng.integers(1, 5, size=(B, L)).astype(np.int32)
        mel_len = dur.sum(1)
        T = int(mel_len.max())
        batch_np = {
            "phoneme": rng.integers(1, 28, (B, L)).astype(np.int32),
            "puncts": rng.integers(0, 10, (B, L)).astype(np.int32),
            "phoneme_mask": np.zeros((B, L), bool),
            "pitch": rng.uniform(0, 1, (B, L)).astype(np.float32),
            "energy": rng.uniform(0, 1, (B, L)).astype(np.float32),
            "duration": dur,
            "mel_len": mel_len.astype(np.int32),
            "mel_mask": np.arange(T)[None, :] >= mel_len[:, None],
            "ref_mel": rng.normal(size=(B, 40, 80)).astype(np.float32),
        }

        ref_model.train()
        with torch.no_grad():
            pred_ref = ref_model({k: torch.from_numpy(v) for k, v in batch_np.items()})
        ref_model.eval()

        model = JZeroVox(cfg)
        # torch BatchNorm in train mode uses biased batch stats; our module does
        # the same with spkemb_train=True
        pred, _ = model.apply(variables, batch_np, train=True, spkemb_train=True,
                              rngs={"dropout": __import__("jax").random.PRNGKey(0)},
                              mutable=["batch_stats"])

        np.testing.assert_allclose(np.asarray(pred["mel"]),
                                   pred_ref["mel"].numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(pred["pitch"]),
                                   pred_ref["pitch"].numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(pred["log_duration"]),
                                   pred_ref["log_duration"].numpy(), atol=1e-3)
