"""Checkpoint import/export.

Imports reference PyTorch checkpoints into this framework's flax parameter
pytrees so existing trained artifacts keep working (BASELINE.md fidelity
target: mel/waveform within 1e-2 of the PyTorch reference):

  * ZeroVox Lightning ``.ckpt`` / ``checkpoint.pkl`` (reference
    zerovox/tts/model.py state dict layout: ``_phoneme_encoder.*``,
    ``_spkemb.*``, ``_mel_decoder.*``, optional embedded ``_meldec.*``).
  * HiFi-GAN ``generator.ckpt`` (weight-normed training form; weight norm is
    folded at import exactly like the reference's remove_weight_norm call,
    model.py:115).

Native-framework checkpoints are saved/restored by
zerovox_tpu/training/checkpointing.py (portable flax-msgpack files by
default, orbax sharded TrainState checkpoints with
--checkpoint-format orbax); this module is only the torch bridge.
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor -> float32/int numpy array without importing torch types."""
    arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    if arr.dtype in (np.float64, np.float16):
        arr = arr.astype(np.float32)
    return arr


def _dense(w) -> np.ndarray:
    return _np(w).T  # torch (out,in) -> (in,out)


def _conv1d(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 1, 0))  # (out,in,k) -> (k,in,out)


def _conv2d(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 1, 0))  # (out,in,kh,kw) -> (kh,kw,in,out)


def _convtranspose1d(w) -> np.ndarray:
    # torch (in,out,k) -> flipped (k,in,out) for the lhs-dilated formulation
    return np.flip(np.transpose(_np(w), (2, 0, 1)), axis=0).copy()


def _fold_weight_norm(g, v) -> np.ndarray:
    """weight_norm dim=0: w = g * v / ||v||, norm over all dims but 0."""
    g = _np(g)
    v = _np(v)
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v**2, axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


class _SD:
    """Prefix view over a torch state dict."""

    def __init__(self, sd: dict, prefix: str = ""):
        self.sd = sd
        self.prefix = prefix

    def sub(self, prefix: str) -> "_SD":
        return _SD(self.sd, self.prefix + prefix)

    def __getitem__(self, key: str):
        return self.sd[self.prefix + key]

    def __contains__(self, key: str) -> bool:
        return (self.prefix + key) in self.sd

    def conv_weight(self, key: str) -> np.ndarray:
        """Conv1d weight in either plain or weight-normed form, folded, HIO."""
        if key + ".weight" in self:
            return _conv1d(self[key + ".weight"])
        return _conv1d(_fold_weight_norm(self[key + ".weight_g"], self[key + ".weight_v"]))


# ------------------------------------------------------------- FS2 submodules


def _convert_layer_norm(sd: _SD) -> dict:
    return {"scale": _np(sd["weight"]), "bias": _np(sd["bias"])}


def _convert_scln(sd: _SD) -> dict:
    return {"affine_layer": {"kernel": _dense(sd["affine_layer.linear.weight"])}}


def _convert_fft_block(sd: _SD, scln: bool) -> dict:
    ln = _convert_scln if scln else _convert_layer_norm
    return {
        "slf_attn": {
            "w_qs": {"kernel": _dense(sd["slf_attn.w_qs.weight"]), "bias": _np(sd["slf_attn.w_qs.bias"])},
            "w_ks": {"kernel": _dense(sd["slf_attn.w_ks.weight"]), "bias": _np(sd["slf_attn.w_ks.bias"])},
            "w_vs": {"kernel": _dense(sd["slf_attn.w_vs.weight"]), "bias": _np(sd["slf_attn.w_vs.bias"])},
            "fc": {"kernel": _dense(sd["slf_attn.fc.weight"]), "bias": _np(sd["slf_attn.fc.bias"])},
            "layer_norm": ln(sd.sub("slf_attn.layer_norm.")),
        },
        "pos_ffn": {
            "w_1": {"kernel": _conv1d(sd["pos_ffn.w_1.weight"]), "bias": _np(sd["pos_ffn.w_1.bias"])},
            "w_2": {"kernel": _conv1d(sd["pos_ffn.w_2.weight"]), "bias": _np(sd["pos_ffn.w_2.bias"])},
            "layer_norm": ln(sd.sub("pos_ffn.layer_norm.")),
        },
    }


def _convert_variance_predictor(sd: _SD) -> dict:
    return {
        "conv1d_1": {"kernel": _conv1d(sd["conv_layer.conv1d_1.conv.weight"]),
                     "bias": _np(sd["conv_layer.conv1d_1.conv.bias"])},
        "layer_norm_1": _convert_layer_norm(sd.sub("conv_layer.layer_norm_1.")),
        "conv1d_2": {"kernel": _conv1d(sd["conv_layer.conv1d_2.conv.weight"]),
                     "bias": _np(sd["conv_layer.conv1d_2.conv.bias"])},
        "layer_norm_2": _convert_layer_norm(sd.sub("conv_layer.layer_norm_2.")),
        "linear_layer": {"kernel": _dense(sd["linear_layer.weight"]), "bias": _np(sd["linear_layer.bias"])},
    }


def convert_fs2_encoder(sd: _SD, n_layers: int) -> dict:
    """reference _phoneme_encoder.* -> FS2Encoder params."""
    enc = {
        "src_word_emb": {"embedding": _np(sd["_encoder.src_word_emb.weight"])},
        "punct_embed": {"embedding": _np(sd["_encoder.punct_embed.weight"])},
    }
    for i in range(n_layers):
        enc[f"layer_{i}"] = _convert_fft_block(sd.sub(f"_encoder.layer_stack.{i}."), scln=False)

    va = {
        "duration_predictor": _convert_variance_predictor(sd.sub("_variance_adaptor.duration_predictor.")),
        "pitch_predictor": _convert_variance_predictor(sd.sub("_variance_adaptor.pitch_predictor.")),
        "energy_predictor": _convert_variance_predictor(sd.sub("_variance_adaptor.energy_predictor.")),
        "pitch_embedding": {"embedding": _np(sd["_variance_adaptor.pitch_embedding.weight"])},
        "energy_embedding": {"embedding": _np(sd["_variance_adaptor.energy_embedding.weight"])},
    }
    return {"encoder": enc, "variance_adaptor": va}


def convert_fs2_decoder(sd: _SD, n_layers: int, scln: bool) -> dict:
    """reference _mel_decoder.* (fastspeech2 kind) -> FS2Decoder params."""
    out = {}
    for i in range(n_layers):
        out[f"layer_{i}"] = _convert_fft_block(sd.sub(f"layer_stack.{i}."), scln=scln)
    out["mel_linear"] = {"kernel": _dense(sd["mel_linear.weight"]), "bias": _np(sd["mel_linear.bias"])}
    return out


# -------------------------------------------------------------------- ResNet


def _convert_bn(sd: _SD) -> tuple[dict, dict]:
    params = {"scale": _np(sd["weight"]), "bias": _np(sd["bias"])}
    stats = {"mean": _np(sd["running_mean"]), "var": _np(sd["running_var"])}
    return params, stats


def convert_resnetse(sd: _SD, layers=(3, 4, 6, 3)) -> tuple[dict, dict]:
    """reference _spkemb.* -> (params, batch_stats) for ResNetSE34V2."""
    params: dict = {}
    stats: dict = {}

    params["conv1"] = {"kernel": _conv2d(sd["conv1.weight"]), "bias": _np(sd["conv1.bias"])}
    params["bn1"], stats["bn1"] = _convert_bn(sd.sub("bn1."))

    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            t = sd.sub(f"layer{stage + 1}.{b}.")
            name = f"layer{stage + 1}_{b}"
            p: dict = {
                "conv1": {"kernel": _conv2d(t["conv1.weight"])},
                "conv2": {"kernel": _conv2d(t["conv2.weight"])},
                "se": {
                    "fc1": {"kernel": _dense(t["se.fc.0.weight"]), "bias": _np(t["se.fc.0.bias"])},
                    "fc2": {"kernel": _dense(t["se.fc.2.weight"]), "bias": _np(t["se.fc.2.bias"])},
                },
            }
            s: dict = {}
            p["bn1"], s["bn1"] = _convert_bn(t.sub("bn1."))
            p["bn2"], s["bn2"] = _convert_bn(t.sub("bn2."))
            if "downsample.0.weight" in t:
                p["downsample_conv"] = {"kernel": _conv2d(t["downsample.0.weight"])}
                p["downsample_bn"], s["downsample_bn"] = _convert_bn(t.sub("downsample.1."))
            params[name] = p
            stats[name] = s

    # attention: Conv1d(k=1) pair around BatchNorm1d -> Dense/BatchNorm
    params["att_conv1"] = {"kernel": _np(sd["attention.0.weight"])[:, :, 0].T,
                           "bias": _np(sd["attention.0.bias"])}
    params["att_bn"], stats["att_bn"] = _convert_bn(sd.sub("attention.2."))
    params["att_conv2"] = {"kernel": _np(sd["attention.3.weight"])[:, :, 0].T,
                           "bias": _np(sd["attention.3.bias"])}
    params["fc"] = {"kernel": _dense(sd["fc.weight"]), "bias": _np(sd["fc.bias"])}
    return params, stats


# ------------------------------------------------------------------ StyleTTS


def _convert_wn_conv(sd: _SD, key: str, bias: bool = True) -> dict:
    """torch weight_norm(Conv1d) -> WeightNormConv1d {v (k,in,out), g (out,), bias}."""
    v = np.transpose(_np(sd[key + ".weight_v"]), (2, 1, 0))
    g = _np(sd[key + ".weight_g"]).reshape(-1)
    out = {"v": v, "g": g}
    if bias:
        out["bias"] = _np(sd[key + ".bias"])
    return out


def _convert_resblk1d(sd: _SD, normalize: bool, learned_sc: bool) -> dict:
    p = {
        "conv1": _convert_wn_conv(sd, "conv1"),
        "conv2": _convert_wn_conv(sd, "conv2"),
    }
    if normalize:
        p["norm1"] = {"scale": _np(sd["norm1.weight"]), "bias": _np(sd["norm1.bias"])}
        p["norm2"] = {"scale": _np(sd["norm2.weight"]), "bias": _np(sd["norm2.bias"])}
    if learned_sc:
        p["conv1x1"] = _convert_wn_conv(sd, "conv1x1", bias=False)
    return p


def _convert_adain_resblk1d(sd: _SD, learned_sc: bool) -> dict:
    p = {
        "conv1": _convert_wn_conv(sd, "conv1"),
        "conv2": _convert_wn_conv(sd, "conv2"),
        "norm1": {"fc": {"kernel": _dense(sd["norm1.fc.weight"]), "bias": _np(sd["norm1.fc.bias"])}},
        "norm2": {"fc": {"kernel": _dense(sd["norm2.fc.weight"]), "bias": _np(sd["norm2.fc.bias"])}},
    }
    if learned_sc:
        p["conv1x1"] = _convert_wn_conv(sd, "conv1x1", bias=False)
    return p


def convert_styletts_decoder(sd: _SD) -> dict:
    """reference _mel_decoder.* (styletts kind) -> StyleTTSDecoder params."""
    params = {
        "encode_0": _convert_resblk1d(sd.sub("encode.0."), normalize=True, learned_sc=True),
        "encode_1": _convert_resblk1d(sd.sub("encode.1."), normalize=True, learned_sc=False),
        "asr_res_conv": _convert_wn_conv(sd, "asr_res.0"),
        "asr_res_norm": {"scale": _np(sd["asr_res.1.weight"]), "bias": _np(sd["asr_res.1.bias"])},
        "to_out": _convert_wn_conv(sd, "to_out.0"),
    }
    # decode blocks: learned_sc when dim_in != dim_out (blocks 0,1: 1120->1056;
    # block 2: 1120->528 -> learned; 3,4: 528->528 -> not learned)
    for i in range(5):
        learned = i in (0, 1, 2)
        params[f"decode_{i}"] = _convert_adain_resblk1d(sd.sub(f"decode.{i}."), learned_sc=learned)
    return params


# ------------------------------------------------------------------- HiFiGAN


def convert_hifigan_generator(sd: _SD, cfg) -> dict:
    """HiFi-GAN generator state dict -> Generator params, with weight norm
    folded (training-form weight_g/weight_v or already-removed plain weight)."""

    def conv(key):
        return {"kernel": sd.conv_weight(key), "bias": _np(sd[key + ".bias"])}

    def convt(key):
        if key + ".weight" in sd:
            w = _np(sd[key + ".weight"])
        else:
            w = _fold_weight_norm(sd[key + ".weight_g"], sd[key + ".weight_v"])
        return {"kernel": np.flip(np.transpose(w, (2, 0, 1)), axis=0).copy(),
                "bias": _np(sd[key + ".bias"])}

    params = {"conv_pre": conv("conv_pre"), "conv_post": conv("conv_post")}
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        params[f"ups_{i}"] = convt(f"ups.{i}")
        for j in range(num_kernels):
            n = i * num_kernels + j
            blk = {}
            if cfg.resblock == "1":
                for c in range(len(cfg.resblock_dilation_sizes[j])):
                    blk[f"convs1_{c}"] = conv(f"resblocks.{n}.convs1.{c}")
                    blk[f"convs2_{c}"] = conv(f"resblocks.{n}.convs2.{c}")
            else:
                for c in range(len(cfg.resblock_dilation_sizes[j])):
                    blk[f"convs_{c}"] = conv(f"resblocks.{n}.convs.{c}")
            params[f"resblocks_{n}"] = blk
    return params


def _fold_spectral_norm(w_orig, u, v) -> np.ndarray:
    """spectral_norm eval-mode weight: w_orig / sigma, sigma = u^T W v with
    the stored power-iteration vectors (torch keeps u/v fixed in eval)."""
    w = _np(w_orig)
    u = _np(u)
    v = _np(v)
    sigma = u @ w.reshape(w.shape[0], -1) @ v
    return w / sigma


def _disc_weight(sd: _SD, key: str) -> np.ndarray:
    """Effective discriminator conv weight: plain / weight_norm / spectral_norm."""
    if key + ".weight" in sd:
        return _np(sd[key + ".weight"])
    if key + ".weight_g" in sd:
        return _fold_weight_norm(sd[key + ".weight_g"], sd[key + ".weight_v"])
    return _fold_spectral_norm(sd[key + ".weight_orig"], sd[key + ".weight_u"],
                               sd[key + ".weight_v"])


def convert_hifigan_mpd(state_dict: dict, periods=(2, 3, 5, 7, 11)) -> dict:
    """MultiPeriodDiscriminator state dict -> flax params
    (reference hifigan.py:142-203; Conv2d OIHW -> flax HWIO)."""
    sd = _SD(state_dict)
    params = {}
    for i, p in enumerate(periods):
        d = sd.sub(f"discriminators.{i}.")
        dp = {}
        for j in range(5):
            w = _disc_weight(d, f"convs.{j}")
            dp[f"convs_{j}"] = {"kernel": np.transpose(w, (2, 3, 1, 0)).copy(),
                                "bias": _np(d[f"convs.{j}.bias"])}
        w = _disc_weight(d, "conv_post")
        dp["conv_post"] = {"kernel": np.transpose(w, (2, 3, 1, 0)).copy(),
                           "bias": _np(d["conv_post.bias"])}
        params[f"disc_p{p}"] = dp
    return params


def convert_hifigan_msd(state_dict: dict) -> dict:
    """MultiScaleDiscriminator state dict -> flax params (reference
    hifigan.py:205-262; scale 0 is spectral-normed, Conv1d OIK -> KIO)."""
    sd = _SD(state_dict)
    params = {}
    for i in range(3):
        d = sd.sub(f"discriminators.{i}.")
        ds = {}
        for j in range(7):
            w = _disc_weight(d, f"convs.{j}")
            ds[f"convs_{j}"] = {"kernel": np.transpose(w, (2, 1, 0)).copy(),
                                "bias": _np(d[f"convs.{j}.bias"])}
        w = _disc_weight(d, "conv_post")
        ds["conv_post"] = {"kernel": np.transpose(w, (2, 1, 0)).copy(),
                           "bias": _np(d["conv_post.bias"])}
        params[f"disc_s{i}"] = ds
    return params


# ------------------------------------------------------------------ top level


def convert_zerovox_state_dict(state_dict: dict, cfg) -> dict:
    """Full reference ZeroVox state dict -> flax variables for models.zerovox.ZeroVox.

    Returns {"params": ..., "batch_stats": ...}. `cfg` is a ZeroVoxConfig.
    """
    sd = _SD(state_dict)
    m = cfg.model

    pe = convert_fs2_encoder(sd.sub("_phoneme_encoder."), n_layers=m.encoder.fs2_layer)
    spk_params, spk_stats = convert_resnetse(sd.sub("_spkemb."), layers=tuple(m.resnet.layers))

    if m.decoder.kind == "fastspeech2":
        dec = convert_fs2_decoder(sd.sub("_mel_decoder."), n_layers=m.decoder.n_layers, scln=m.decoder.scln)
    else:
        dec = convert_styletts_decoder(sd.sub("_mel_decoder."))

    return {
        "params": {"phoneme_encoder": pe, "spkemb": spk_params, "mel_decoder": dec},
        "batch_stats": {"spkemb": spk_stats},
    }


def load_torch_checkpoint(path) -> dict:
    """Load a torch .ckpt/.pkl and return its state_dict (CPU tensors)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    if isinstance(ckpt, dict) and "generator" in ckpt:
        return ckpt["generator"]
    return ckpt


def load_zerovox_checkpoint(path, cfg) -> dict:
    """Reference .ckpt -> flax variables (strict=False semantics: embedded
    _meldec.* weights are returned separately under "meldec" when present)."""
    state_dict = load_torch_checkpoint(path)
    variables = convert_zerovox_state_dict(state_dict, cfg)
    meldec_sd = {k[len("_meldec."):]: v for k, v in state_dict.items() if k.startswith("_meldec.")}
    if meldec_sd:
        variables["meldec_state_dict"] = meldec_sd
    return variables
