"""Experiment: space-to-depth lane packing for the speaker encoder's layer1.

bench_se_stages.py showed layer1 — three stride-1 SE-ResNet blocks at full
[B, 80, 344, 32] resolution — is 57% of the encoder's backward at 6% MFU:
C=32 in the minor (lane) dimension wastes 3/4 of every 128-wide tile on
both the MXU and the VPU. This prototype packs 2x2 spatial into channels
(C 32 -> 128, exactly one lane tile) and re-expresses every op of the
block with *identical math*:

  * 3x3 conv  -> packed 3x3 conv whose [4C, 4C] weights are a fixed
    phase-structured rearrangement (with zeros) of the canonical [C, C]
    weights; zero padding commutes with the packing.
  * BatchNorm -> stats reduced over (B, H', W', phase-group) per original
    channel, so train-mode batch stats equal the unpacked ones.
  * SE gate   -> global mean over (H', W', phases) per original channel,
    gate tiled back across phases.
  * relu / residual add -> elementwise, layout-independent.

Measures fwd and fwd+bwd (grads wrt params + input) for the unpacked and
packed variants at the training shape, and checks numerical parity.

    python scripts/exp_se_packed.py [--batch 8] [--ref-len 344] [--check]
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
    ap.add_argument("--check", action="store_true",
                    help="verify packed == unpacked numerically (f32, CPU ok)")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    C = 32
    B, T = args.batch, args.ref_len

    # ---- canonical (unpacked) SE block params -----------------------------
    rng = np.random.default_rng(0)

    def conv_w(cin, cout):
        return (rng.normal(size=(3, 3, cin, cout)) / np.sqrt(9 * cin)).astype(np.float32)

    def block_params(i):
        return {
            "conv1": conv_w(C, C),
            "conv2": conv_w(C, C),
            "bn1_scale": rng.uniform(0.5, 1.5, C).astype(np.float32),
            "bn1_bias": rng.normal(size=C).astype(np.float32) * 0.1,
            "bn2_scale": rng.uniform(0.5, 1.5, C).astype(np.float32),
            "bn2_bias": rng.normal(size=C).astype(np.float32) * 0.1,
            "se_w1": (rng.normal(size=(C, C // 8)) / np.sqrt(C)).astype(np.float32),
            "se_b1": np.zeros(C // 8, np.float32),
            "se_w2": (rng.normal(size=(C // 8, C)) / np.sqrt(C // 8)).astype(np.float32),
            "se_b2": np.zeros(C, np.float32),
        }

    params = {f"b{i}": block_params(i) for i in range(3)}

    # ---- unpacked reference ------------------------------------------------
    def bn_train(x, scale, bias):
        mu = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.mean((x - mu) ** 2, axis=(0, 1, 2))
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    def conv3x3(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)

    def se_gate(x, p):
        y = jnp.mean(x, axis=(1, 2))
        y = jax.nn.relu(y @ p["se_w1"] + p["se_b1"])
        y = jax.nn.sigmoid(y @ p["se_w2"] + p["se_b2"])
        return x * y[:, None, None, :]

    def block(x, p):
        out = conv3x3(x, p["conv1"])
        out = jax.nn.relu(out)
        out = bn_train(out, p["bn1_scale"], p["bn1_bias"])
        out = conv3x3(out, p["conv2"])
        out = bn_train(out, p["bn2_scale"], p["bn2_bias"])
        out = se_gate(out, p)
        return jax.nn.relu(out + x)

    def layer1(params, x):
        for i in range(3):
            x = block(x, params[f"b{i}"])
        return x

    # ---- packed variant ----------------------------------------------------
    def pack(x):  # [B,H,W,C] -> [B,H/2,W/2,4C], phase-major p = 2*ph+pw
        Bv, H, W, Cv = x.shape
        x = x.reshape(Bv, H // 2, 2, W // 2, 2, Cv)
        return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(Bv, H // 2, W // 2, 4 * Cv)

    def unpack(x):
        Bv, H2, W2, C4 = x.shape
        Cv = C4 // 4
        x = x.reshape(Bv, H2, W2, 2, 2, Cv)
        return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(Bv, H2 * 2, W2 * 2, Cv)

    # constant per-axis tap maps for the packed-weight gather: for packed tap
    # rh and (input phase ph, output phase qh) the original tap is
    # dh = 2*(rh-1) + ph - qh, valid iff |dh| <= 1. One gather+mask per call
    # (keeps the weight transform differentiable and cheap to compile,
    # unlike 144 scatters).
    def _axis_maps():
        idx = np.zeros((3, 2, 2), np.int32)
        msk = np.zeros((3, 2, 2), np.float32)
        for r in range(3):
            for p in range(2):
                for q in range(2):
                    d = 2 * (r - 1) + p - q
                    if -1 <= d <= 1:
                        idx[r, p, q] = d + 1
                        msk[r, p, q] = 1.0
        return jnp.asarray(idx), jnp.asarray(msk)

    IDX_H, MSK_H = _axis_maps()

    def pack_w(w):
        """[3,3,C,C] -> [3,3,4C,4C] phase-structured packed weights."""
        # gather: wp8[rh,ph,qh, rw,pw,qw, ci,co] = w[dh+1, dw+1, ci, co] * valid
        g = w[IDX_H[:, :, :, None, None, None], IDX_H[None, None, None]]
        g = g * (MSK_H[:, :, :, None, None, None]
                 * MSK_H[None, None, None])[..., None, None].astype(w.dtype)
        # -> [rh, rw, (ph pw ci), (qh qw co)] = [3, 3, 4C, 4C]
        g = jnp.transpose(g, (0, 3, 1, 4, 6, 2, 5, 7))
        return g.reshape(3, 3, 4 * C, 4 * C)

    def bn_train_packed(x, scale, bias):
        # stats per original channel: reduce over batch, space, AND phases
        Bv, H2, W2, _ = x.shape
        xr = x.reshape(Bv, H2, W2, 4, C)
        mu = jnp.mean(xr, axis=(0, 1, 2, 3))
        var = jnp.mean((xr - mu) ** 2, axis=(0, 1, 2, 3))
        scale4, bias4 = jnp.tile(scale, 4), jnp.tile(bias, 4)
        mu4, var4 = jnp.tile(mu, 4), jnp.tile(var, 4)
        return (x - mu4) * jax.lax.rsqrt(var4 + 1e-5) * scale4 + bias4

    def se_gate_packed(x, p):
        Bv, H2, W2, _ = x.shape
        y = jnp.mean(x.reshape(Bv, H2, W2, 4, C), axis=(1, 2, 3))
        y = jax.nn.relu(y @ p["se_w1"] + p["se_b1"])
        y = jax.nn.sigmoid(y @ p["se_w2"] + p["se_b2"])
        return x * jnp.tile(y, 4)[:, None, None, :]

    def block_packed(x, p):
        out = conv3x3(x, pack_w(p["conv1"]))
        out = jax.nn.relu(out)
        out = bn_train_packed(out, p["bn1_scale"], p["bn1_bias"])
        out = conv3x3(out, pack_w(p["conv2"]))
        out = bn_train_packed(out, p["bn2_scale"], p["bn2_bias"])
        out = se_gate_packed(out, p)
        return jax.nn.relu(out + x)

    def layer1_packed(params, x):
        xp = pack(x)
        for i in range(3):
            xp = block_packed(xp, params[f"b{i}"])
        return unpack(xp)

    x_np = rng.normal(size=(B, 80, T, C)).astype(np.float32)

    if args.check:
        # pin the parity check to the CPU backend: on the tunneled TPU,
        # --xla_allow_excess_precision demotes nominal-f32 convs to bf16
        # (PERFORMANCE.md backend quirks), which would drown the comparison
        with jax.default_device(jax.devices("cpu")[0]):
            y0 = jax.jit(layer1)(params, jnp.asarray(x_np))
            y1 = jax.jit(layer1_packed)(params, jnp.asarray(x_np))
            err = float(jnp.max(jnp.abs(y0 - y1)))
        print(f"max |packed - unpacked| = {err:.3e}")
        assert err < 1e-4, "packed math does not match"

    # ---- timing (bf16, like the training step) ----------------------------
    def half(t):
        return jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == np.float32 else v, t)

    dev = jax.devices()[0]
    hp = jax.device_put(half(params), dev)
    hx = jax.device_put(jnp.asarray(x_np, jnp.bfloat16), dev)

    results: list[dict] = []
    for name, fn in [("unpacked", layer1), ("packed", layer1_packed)]:
        measure(f"{name}_fwd", fn, (hp, hx),
                lambda o: o.reshape(-1)[0], results)
        measure(f"{name}_grad",
                lambda p, x, _f=fn: jax.grad(
                    lambda q, y: _f(q, y).sum().astype(jnp.float32),
                    argnums=(0, 1))(p, x),
                (hp, hx),
                lambda g: jax.tree.leaves(g)[0].reshape(-1)[0], results)

    out = {"batch": B, "ref_len": T, "rows": results}
    print(json.dumps(out))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
