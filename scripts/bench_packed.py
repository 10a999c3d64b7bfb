"""Lane-packed vocoder stage benchmark: XLA vs fused-MRF vs packed-stage.

Three generator variants on the current device (tts_medium meldec config):
  * xla     — plain XLA lowering (use_pallas=False)
  * mrf     — round-2 fused-MRF Pallas kernel (ZEROVOX_PACKED=0)
  * packed  — round-3 lane-packed stage kernel for the C<=64 stages
              (space-to-depth banded block matmuls + fused ConvTranspose
              upsample, ops/pallas/packed.py) — the default when Pallas is
              enabled

with numerical parity checks. This is the evidence for VERDICT r2 weak #2
(stage4's C=32 convs waste 15/16 of each MXU tile) and #3 (fold the
upsample into the stage kernel).

    python scripts/bench_packed.py [--buckets 344,689,1750] [--batches 1,4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="344,689,1750")
    ap.add_argument("--batches", default="1,4")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from zerovox_tpu.models.hifigan import HifiGanConfig, MelDec
    from zerovox_tpu.utils.profiling import forced_device_time

    cfg = HifiGanConfig()
    rng = np.random.default_rng(0)

    md_xla = MelDec(cfg, use_pallas=False)
    md_pls = MelDec(cfg, use_pallas=True, pallas_all_batches=True)
    mel0 = jnp.asarray(rng.normal(size=(1, 87, cfg.num_mels)).astype(np.float32))
    variables = md_xla.init(jax.random.PRNGKey(0), mel0)

    # the packed toggle is read at trace time inside Generator.__call__, so
    # each variant gets its own jitted callable traced under its env setting
    def make(fn_env):
        def f(v, m):
            return md_pls.apply(v, m)

        jf = jax.jit(f)

        def call(v, m):
            os.environ["ZEROVOX_PACKED"] = fn_env
            return jf(v, m)

        return call

    f_xla = jax.jit(lambda v, m: md_xla.apply(v, m))
    f_mrf = make("0")
    f_packed = make("auto")

    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    probe = jax.jit(lambda w: w[..., :1].sum())

    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        for T in [int(t) for t in args.buckets.split(",")]:
            mel = jax.device_put(
                rng.normal(size=(B, T, cfg.num_mels)).astype(np.float32), dev)

            def timeit(f):
                out = f(variables, mel)  # compile (traces under its env)
                secs = forced_device_time(lambda: f(variables, mel), probe,
                                          iters=(3, 3 + args.iters))
                return secs, out

            xla_s, out_x = timeit(f_xla)
            mrf_s, out_m = timeit(f_mrf)
            pck_s, out_p = timeit(f_packed)
            err_m = float(jnp.abs(out_x - out_m).max())
            err_p = float(jnp.abs(out_x - out_p).max())
            rows.append({
                "batch": B, "mel_frames": T,
                "xla_ms": round(1000 * xla_s, 2),
                "mrf_ms": round(1000 * mrf_s, 2),
                "packed_ms": round(1000 * pck_s, 2),
                "packed_vs_xla": round(xla_s / max(pck_s, 1e-9), 3),
                "packed_vs_mrf": round(mrf_s / max(pck_s, 1e-9), 3),
                "max_abs_diff_mrf": err_m,
                "max_abs_diff_packed": err_p,
            })
            print(rows[-1], file=sys.stderr, flush=True)
            assert err_p < 2e-3, f"packed/XLA mismatch: {err_p}"

    print(json.dumps({"config": "hifigan-v1 medium", "rows": rows}))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
