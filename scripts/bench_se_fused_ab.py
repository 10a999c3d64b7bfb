"""Isolated A/B: speaker-encoder fwd+bwd with the fused Pallas stage-1
(ops/pallas/se_fused.py) vs the packed XLA path, at production training
shapes. The full-step bench showed fused LOSING 0.9 ms end-to-end
(docs/bench_scaling_r4_fused_b8.json 23.86 vs 22.98); this separates
"the kernel is slower than XLA's stage-1 schedule" from "integration
copies / lost overlap elsewhere in the step eat a real kernel win".

    python scripts/bench_se_fused_ab.py [--batch 8] [--ref-len 344]
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
    args = ap.parse_args()

    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from zerovox_tpu.models.resnetse import ResNetSE34V2

    B, T = args.batch, args.ref_len
    rng = np.random.default_rng(0)
    mel = rng.uniform(0.1, 1.0, (B, T, 80)).astype(np.float32)
    dev = jax.devices()[0]
    results = []

    def half(tree):
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                            if x.dtype == jnp.float32 else x, tree)

    key = jax.random.PRNGKey(0)
    # identical trees across variants: init once (CPU — eager init over the
    # wire costs minutes on this backend), reuse for both
    enc0 = ResNetSE34V2(layers=(3, 4, 6, 3), num_filters=(32, 64, 128, 256),
                        n_out=528, encoder_type="ASP", n_mels=80,
                        packed_stages=1)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = enc0.init(key, jnp.asarray(mel), train=True)
    hp = jax.device_put(half(variables["params"]), dev)
    stats = jax.device_put(variables["batch_stats"], dev)
    hmel = jax.device_put(jnp.asarray(mel, jnp.bfloat16), dev)

    for name, fused in (("packed_xla", False), ("fused_pallas", True)):
        enc = ResNetSE34V2(layers=(3, 4, 6, 3),
                           num_filters=(32, 64, 128, 256),
                           n_out=528, encoder_type="ASP", n_mels=80,
                           packed_stages=1, fused_stage1=fused)

        def fwd(p, x, _e=enc):
            out, _ = _e.apply({"params": p, "batch_stats": stats}, x,
                              train=True, mutable=["batch_stats"])
            return out

        measure(f"{name}_fwd", fwd, (hp, hmel),
                lambda o: o.reshape(-1)[0], results)
        measure(f"{name}_fwdbwd",
                lambda p, x, _f=fwd: jax.grad(
                    lambda q, y: _f(q, y).sum().astype(jnp.float32),
                    argnums=(0, 1))(p, x),
                (hp, hmel),
                lambda g: jax.tree.leaves(g)[0].reshape(-1)[0], results)

    out = {"batch": B, "ref_len": T, "rows": results}
    print(json.dumps(out, indent=1))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
