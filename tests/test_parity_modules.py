"""Parity of speaker encoder / StyleTTS decoder / HiFi-GAN vs torch reference."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference

from zerovox_tpu.checkpoint import (
    _SD,
    convert_hifigan_generator,
    convert_resnetse,
    convert_styletts_decoder,
)
from zerovox_tpu.models.hifigan import Generator as JGenerator, HifiGanConfig
from zerovox_tpu.models.resnetse import ResNetSE34V2 as JResNet
from zerovox_tpu.models.styletts import StyleTTSDecoder as JStyleTTS

fs2_ref, styletts_ref, resnet_ref, hifigan_ref = load_reference()

ATOL = 3e-4


class TestResNetSEParity:
    @pytest.mark.parametrize("encoder_type", ["ASP", "SAP"])
    def test_forward(self, encoder_type):
        torch.manual_seed(10)
        layers = (2, 2, 2, 2)
        filters = (8, 16, 32, 64)
        ref = resnet_ref.ResNetSE34V2(layers=list(layers), num_filters=list(filters),
                                      nOut=48, encoder_type=encoder_type,
                                      n_mels=80, log_input=False)

        # perturb BN running stats so the conversion of batch_stats is exercised
        rng = np.random.default_rng(11)
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm2d) or isinstance(m, torch.nn.BatchNorm1d):
                    m.running_mean.copy_(torch.from_numpy(rng.normal(size=m.running_mean.shape).astype(np.float32) * 0.1))
                    m.running_var.copy_(torch.from_numpy(1.0 + rng.uniform(0, 0.5, size=m.running_var.shape).astype(np.float32)))
        ref.eval()

        x = rng.normal(size=(2, 96, 80)).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x)).numpy()

        params, stats = convert_resnetse(_SD(ref.state_dict()), layers=layers)
        model = JResNet(layers=layers, num_filters=filters, n_out=48,
                        encoder_type=encoder_type, n_mels=80, log_input=False)
        y = model.apply({"params": params, "batch_stats": stats}, x)

        assert y.shape == y_ref.shape == (2, 1, 48)
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=ATOL)


class TestStyleTTSParity:
    def test_forward(self):
        torch.manual_seed(20)
        dim_in, style_dim, res_dim, n_mels = 32, 48, 8, 20
        ref = styletts_ref.StyleTTSDecoder(dim_in=dim_in, style_dim=style_dim,
                                           residual_dim=res_dim, dim_out=n_mels)
        ref.eval()

        rng = np.random.default_rng(21)
        x = rng.normal(size=(2, 24, dim_in)).astype(np.float32)
        style = rng.normal(size=(2, 1, style_dim)).astype(np.float32) * 0.2

        with torch.no_grad():
            y_ref, _ = ref(torch.from_numpy(x), None, torch.from_numpy(style))

        params = convert_styletts_decoder(_SD(ref.state_dict()))
        model = JStyleTTS(dim_in=dim_in, style_dim=style_dim,
                          residual_dim=res_dim, dim_out=n_mels)
        y = model.apply({"params": params}, x, None, style)

        np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=ATOL)


class _AttrDict(dict):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.__dict__ = self


def _hifi_small(resblock="1"):
    # reference ResBlock1 hardcodes 3 dilation entries, ResBlock2 two
    dil = [1, 3, 5] if resblock == "1" else [1, 3]
    return {
        "resblock": resblock,
        "upsample_rates": [4, 4],
        "upsample_kernel_sizes": [8, 8],
        "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3, 5],
        "resblock_dilation_sizes": [dil, dil],
        "num_mels": 80,
        "sampling_rate": 22050,
    }


class TestHifiGanParity:
    @pytest.mark.parametrize("resblock", ["1", "2"])
    def test_generator_weightnorm_form(self, resblock):
        torch.manual_seed(30)
        conf = _hifi_small(resblock)
        ref = hifigan_ref.Generator(_AttrDict(conf))
        ref.eval()

        rng = np.random.default_rng(31)
        mel = rng.normal(size=(1, 80, 37)).astype(np.float32)  # torch NCL
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(mel)).numpy()  # [1, 1, T*16]

        cfg = HifiGanConfig.from_dict(conf)
        params = convert_hifigan_generator(_SD(ref.state_dict()), cfg)
        model = JGenerator(cfg)
        y = model.apply({"params": params}, np.transpose(mel, (0, 2, 1)))

        assert y.shape == (1, 37 * 16)
        np.testing.assert_allclose(np.asarray(y), y_ref[:, 0, :], atol=ATOL)

    def test_generator_removed_weightnorm_form(self):
        torch.manual_seed(32)
        conf = _hifi_small("1")
        ref = hifigan_ref.Generator(_AttrDict(conf))
        ref.eval()
        ref.remove_weight_norm()

        rng = np.random.default_rng(33)
        mel = rng.normal(size=(1, 80, 21)).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(mel)).numpy()

        cfg = HifiGanConfig.from_dict(conf)
        params = convert_hifigan_generator(_SD(ref.state_dict()), cfg)
        model = JGenerator(cfg)
        y = model.apply({"params": params}, np.transpose(mel, (0, 2, 1)))
        np.testing.assert_allclose(np.asarray(y), y_ref[:, 0, :], atol=ATOL)
