"""Speaker-encoder stage decomposition: where do its 10.8 ms go?

The round-3 train-step roofline (bench_step_decompose.py) showed the
ResNetSE34V2 speaker encoder is the bottleneck slice of the training step:
36% of step time for 17% of its FLOPs, at the HBM roof. This script breaks
the encoder itself down — stem conv, each SE-ResNet stage, and the ASP
pooling head — fwd and fwd+bwd in isolation at the real training shapes
(bf16, ref_mel [B, 344, 80], reference architecture
zerovox/tts/ResNetSE34V2.py:101-212), so the next optimization targets the
right stage.

    python scripts/bench_se_stages.py [--batch 8] [--ref-len 344] [--out-json ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_step_decompose import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ref-len", type=int, default=344)
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--encoder-only", action="store_true",
                    help="skip per-stage components; measure only the "
                         "whole-encoder rows (fast A/B of packing variants)")
    args = ap.parse_args()

    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from zerovox_tpu.models.layers import BatchNorm, Conv2d
    from zerovox_tpu.models.resnetse import (
        ResNetSE34V2,
        SEBasicBlock,
        _pack2x2,
        _pack_kernel,
        _unpack2x2,
    )

    B, T = args.batch, args.ref_len
    LAYERS = (3, 4, 6, 3)
    FILTERS = (32, 64, 128, 256)

    class Stem(nn.Module):
        packed: bool = False

        @nn.compact
        def __call__(self, x):
            kw = (dict(kernel_transform=_pack_kernel, kernel_in=1,
                       bias_phases=4) if self.packed else {})
            if self.packed:
                x = _pack2x2(x)
            x = Conv2d(FILTERS[0], (3, 3), padding=(1, 1), use_bias=True,
                       name="conv1")(x, **kw)
            x = jax.nn.relu(x)
            return BatchNorm(FILTERS[0], name="bn1")(
                x, use_running_average=False, phases=4 if self.packed else 1)

    class Stage(nn.Module):
        planes: int
        blocks: int
        first_stride: int
        in_planes: int
        packed: bool = False  # 2x2 lane packing (stride-1 stages only)

        @nn.compact
        def __call__(self, x):
            if self.packed:
                x = _pack2x2(x)
            inplanes = self.in_planes
            for b in range(self.blocks):
                s = self.first_stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != self.planes)
                x = SEBasicBlock(self.planes, stride=s, downsample=down,
                                 train=True, phases=4 if self.packed else 1,
                                 name=f"b{b}")(x)
                inplanes = self.planes
            if self.packed:
                x = _unpack2x2(x)
            return x

    class Head(nn.Module):
        """Flatten + attentive-statistics pooling + FC (ASP)."""

        @nn.compact
        def __call__(self, x):
            Bv, H, W, C = x.shape
            x = jnp.transpose(x, (0, 3, 1, 2)).reshape(Bv, C * H, W)
            w = jnp.transpose(x, (0, 2, 1))
            w = nn.Dense(128, name="att_conv1")(w)
            w = jax.nn.relu(w)
            w = BatchNorm(128, name="att_bn")(w, use_running_average=False)
            w = nn.Dense(C * H, name="att_conv2")(w)
            w = jax.nn.softmax(jnp.transpose(w, (0, 2, 1)), axis=2)
            mu = jnp.sum(x * w, axis=2)
            sg = jnp.sqrt(jnp.clip(jnp.sum((x**2) * w, axis=2) - mu**2, 1e-5, None))
            return nn.Dense(528, name="fc")(jnp.concatenate([mu, sg], axis=1))

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    dev = jax.devices()[0]

    def half(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    # stage input shapes (freq as height, time as width; stem input C=1)
    shapes = {
        "stem": (B, 80, T, 1),
        "layer1": (B, 80, T, FILTERS[0]),
        "layer2": (B, 80, T, FILTERS[0]),
        "layer3": (B, 40, (T + 1) // 2, FILTERS[1]),
        "layer4": (B, 20, (T + 3) // 4, FILTERS[2]),
        "head": (B, 10, (T + 7) // 8, FILTERS[3]),
    }
    shapes["layer1_packed"] = shapes["layer1"]
    shapes["stem_packed"] = shapes["stem"]
    mods = {
        "stem": Stem(),
        "stem_packed": Stem(packed=True),
        "layer1": Stage(FILTERS[0], LAYERS[0], 1, FILTERS[0]),
        # production packed_speaker path: same params, [H/2, W/2, 4C] layout
        "layer1_packed": Stage(FILTERS[0], LAYERS[0], 1, FILTERS[0], packed=True),
        "layer2": Stage(FILTERS[1], LAYERS[1], 2, FILTERS[0]),
        "layer3": Stage(FILTERS[2], LAYERS[2], 2, FILTERS[1]),
        "layer4": Stage(FILTERS[3], LAYERS[3], 2, FILTERS[2]),
        "head": Head(),
    }

    results: list[dict] = []
    if args.encoder_only:
        mods = {}
    for name, mod in mods.items():
        x_np = rng.normal(size=shapes[name]).astype(np.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = mod.init(key, jnp.asarray(x_np))
        hp = jax.device_put(half(variables["params"]), dev)
        stats = jax.device_put(variables.get("batch_stats", {}), dev)
        hx = jax.device_put(jnp.asarray(x_np, jnp.bfloat16), dev)

        def fwd(p, x, _mod=mod, _stats=stats):
            out, _ = _mod.apply({"params": p, "batch_stats": _stats}, x,
                                mutable=["batch_stats"])
            return out

        measure(f"{name}_fwd", fwd, (hp, hx),
                lambda o: o.reshape(-1)[0], results)
        measure(f"{name}_grad",
                lambda p, x, _f=fwd: jax.grad(
                    lambda q, y: _f(q, y).sum().astype(jnp.float32),
                    argnums=(0, 1))(p, x),
                (hp, hx),
                lambda g: jax.tree.leaves(g)[0].reshape(-1)[0], results)

    # whole encoder for a consistency anchor vs bench_step_decompose
    enc = ResNetSE34V2(layers=LAYERS, num_filters=FILTERS, n_out=528,
                       encoder_type="ASP", n_mels=80)
    mel = rng.normal(size=(B, T, 80)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = enc.init(key, jnp.asarray(mel), train=True)
    hp = jax.device_put(half(variables["params"]), dev)
    stats = jax.device_put(variables["batch_stats"], dev)
    hmel = jax.device_put(jnp.asarray(mel, jnp.bfloat16), dev)

    def enc_fwd(p, x):
        out, _ = enc.apply({"params": p, "batch_stats": stats}, x, train=True,
                           mutable=["batch_stats"])
        return out

    measure("encoder_fwd", enc_fwd, (hp, hmel),
            lambda o: o.reshape(-1)[0], results)
    measure("encoder_grad",
            lambda p, x: jax.grad(
                lambda q, y: enc_fwd(q, y).sum().astype(jnp.float32),
                argnums=(0, 1))(p, x),
            (hp, hmel),
            lambda g: jax.tree.leaves(g)[0].reshape(-1)[0], results)

    # same encoder with the production packed_speaker levels (identical
    # trees, so the exact same device params/stats apply); "stemfull"
    # additionally packs the stem conv itself (packed_stem=True — the
    # pre-round-3b behavior, kept for the A/B record)
    variants = [(1, False, "encoder_packed1"), (2, False, "encoder_packed2"),
                (1, True, "encoder_packed1_stemfull")]
    for lvl, pstem, vname in variants:
        enc_p = ResNetSE34V2(layers=LAYERS, num_filters=FILTERS, n_out=528,
                             encoder_type="ASP", n_mels=80, packed_stages=lvl,
                             packed_stem=pstem)

        def enc_p_fwd(p, x, _e=enc_p):
            out, _ = _e.apply({"params": p, "batch_stats": stats}, x,
                              train=True, mutable=["batch_stats"])
            return out

        measure(f"{vname}_fwd", enc_p_fwd, (hp, hmel),
                lambda o: o.reshape(-1)[0], results)
        measure(f"{vname}_grad",
                lambda p, x, _f=enc_p_fwd: jax.grad(
                    lambda q, y: _f(q, y).sum().astype(jnp.float32),
                    argnums=(0, 1))(p, x),
                (hp, hmel),
                lambda g: jax.tree.leaves(g)[0].reshape(-1)[0], results)

    out = {"batch": B, "ref_len": T, "rows": results}
    print(json.dumps(out))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
