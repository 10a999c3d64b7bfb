"""Model loading / distribution-path tests: native msgpack checkpoints,
torch HiFi-GAN generator.ckpt import, modelcfg.yaml contract, checkpoint
surgery CLI, dump CLI."""

import json
import os

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

from reference_loader import load_reference

from zerovox_tpu.config import DecoderConfig, EncoderConfig, ModelConfig, ResNetConfig, ZeroVoxConfig
from zerovox_tpu.models.hifigan import HifiGanConfig
from zerovox_tpu.synthesize import ZeroVoxTTS

_, _, _, hifigan_ref = load_reference()


class _AttrDict(dict):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.__dict__ = self


MELDEC_CONF = {
    "resblock": "1",
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3, 5]],
    "num_mels": 80,
    "sampling_rate": 22050,
}


def small_cfg_dict():
    return {
        "audio": {"sampling_rate": 22050, "fft_size": 1024, "hop_size": 256,
                  "win_length": 1024, "num_mels": 80, "fmin": 0, "fmax": 8000},
        "model": {
            "max_txt_len": 64, "min_mel_len": 10, "max_mel_len": 256,
            "phones": "'-abcdefghijklmnopqrstuvwxyz", "puncts": " ,.;:-!?\"",
            "emb_dim": 32, "punct_emb_dim": 16,
            "encoder": {"fs2_layer": 1, "fs2_head": 2, "vp_filter_size": 8, "ve_n_bins": 8},
            "decoder": {"kind": "fastspeech2", "n_layers": 1, "n_head": 2,
                        "conv_filter_size": 32, "conv_kernel_size": [9, 1],
                        "dropout": 0.2, "scln": True},
            "resnet": {"layers": [1, 1, 1, 1], "num_filters": [8, 8, 8, 8],
                       "encoder_type": "ASP"},
        },
        "training": {"learning_rate": 1e-4},
        "stats": {"pitch_min": 50.0, "pitch_max": 400.0,
                  "energy_min": 0.1, "energy_max": 50.0},
        "lang": ["en"],
    }


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """A complete on-disk model dir: modelcfg.yaml + native checkpoint."""
    from zerovox_tpu.training.checkpointing import save_native_checkpoint

    d = tmp_path_factory.mktemp("model")
    cfgd = small_cfg_dict()
    with open(d / "modelcfg.yaml", "w") as f:
        yaml.dump(cfgd, f)

    cfg = ZeroVoxConfig.from_dict(cfgd)
    synth = ZeroVoxTTS.from_random(cfg, HifiGanConfig.from_dict(MELDEC_CONF), seed=3)
    os.makedirs(d / "checkpoints")
    import jax
    import numpy as np

    host_vars = jax.tree.map(np.asarray, synth._variables)
    save_native_checkpoint(d / "checkpoints" / "0000.msgpack", host_vars,
                           meta={"epoch": 0, "loss": 1.0})
    return str(d)


@pytest.fixture(scope="module")
def meldec_dir(tmp_path_factory):
    """A vocoder artifact dir in the reference layout: config.json +
    generator.ckpt (torch, weight-normed training form)."""
    d = tmp_path_factory.mktemp("meldec")
    torch.manual_seed(7)
    gen = hifigan_ref.Generator(_AttrDict(dict(MELDEC_CONF)))
    with open(d / "config.json", "w") as f:
        json.dump(MELDEC_CONF, f)
    torch.save({"generator": gen.state_dict()}, d / "generator.ckpt")
    return str(d)


class TestLoadModel:
    def test_load_and_synthesize(self, model_dir, meldec_dir):
        modelcfg, synth = ZeroVoxTTS.load_model(model_dir, meldec_model=meldec_dir)
        assert modelcfg["lang"] == ["en"]
        spkemb = np.zeros((1, 1, synth.cfg.model.emb_size), np.float32)
        wav, phoneme, length = synth.tts("load model test", spkemb)
        assert length > 0
        assert wav.shape[0] == length * 256

    def test_newest_checkpoint_wins(self, model_dir, meldec_dir):
        # add a newer checkpoint; load_model must pick it
        import time

        from zerovox_tpu.training.checkpointing import load_native_checkpoint, save_native_checkpoint

        v = load_native_checkpoint(os.path.join(model_dir, "checkpoints", "0000.msgpack"))
        time.sleep(0.05)
        save_native_checkpoint(os.path.join(model_dir, "checkpoints", "0001.msgpack"), v)
        _, synth = ZeroVoxTTS.load_model(model_dir, meldec_model=meldec_dir)
        assert synth is not None


class TestCheckpointSurgery:
    def test_edit_meldec_native_roundtrip(self, model_dir, meldec_dir, tmp_path):
        import shutil

        from zerovox_tpu.cli.edit_meldec import main as edit_main
        from zerovox_tpu.training.checkpointing import load_native_checkpoint

        ck = tmp_path / "ck.msgpack"
        shutil.copy(os.path.join(model_dir, "checkpoints", "0000.msgpack"), ck)

        edit_main([str(ck), "--meldec", meldec_dir])
        v = load_native_checkpoint(ck)
        assert "meldec" in v and "generator" in v["meldec"]

        edit_main([str(ck)])  # remove
        v = load_native_checkpoint(ck)
        assert "meldec" not in v

    def test_dump_ckpt_cli(self, model_dir, capsys):
        from zerovox_tpu.cli.dump_ckpt import main as dump_main

        dump_main([os.path.join(model_dir, "checkpoints", "0000.msgpack")])
        out = capsys.readouterr().out
        assert "params" in out and "mel_decoder" in out


class TestConfigContract:
    def test_yaml_roundtrip(self, tmp_path):
        cfgd = small_cfg_dict()
        cfg = ZeroVoxConfig.from_dict(cfgd)
        p = tmp_path / "modelcfg.yaml"
        cfg.to_yaml(p)
        cfg2 = ZeroVoxConfig.from_yaml(p)
        assert cfg2.model.emb_dim == 32
        assert cfg2.model.decoder.conv_kernel_size == (9, 1)
        assert cfg2.stats.pitch_max == 400.0
        assert cfg2.langs == ("en",)
        assert cfg2.model.emb_size == 48
