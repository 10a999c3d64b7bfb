"""Vocoder Pallas-kernel benchmark: XLA path vs fused-MRF Pallas path.

Measures the full HiFi-GAN generator (tts_medium meldec config) on the
current device at the synthesis mel buckets, batch 1 and 4, with
`use_pallas` off/on, and checks numerical parity of the two paths while at
it. Results go to docs/PERFORMANCE.md; this is the earn-its-keep evidence
VERDICT r1 weak #7 asked for.

    python scripts/bench_pallas.py [--buckets 344,689,1750] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

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

    cfg = HifiGanConfig()
    rng = np.random.default_rng(0)

    md_xla = MelDec(cfg, use_pallas=False)
    md_pls = MelDec(cfg, use_pallas=True, pallas_all_batches=True)
    mel0 = jnp.asarray(rng.normal(size=(1, 87, cfg.num_mels)).astype(np.float32))
    variables = md_xla.init(jax.random.PRNGKey(0), mel0)

    f_xla = jax.jit(lambda v, m: md_xla.apply(v, m))
    f_pls = jax.jit(lambda v, m: md_pls.apply(v, m))

    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)

    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        for T in [int(t) for t in args.buckets.split(",")]:
            mel = jax.device_put(
                rng.normal(size=(B, T, cfg.num_mels)).astype(np.float32), dev)

            # forced marginal timing: block_until_ready does not actually
            # wait on tunneled backends (see utils/profiling.py)
            from zerovox_tpu.utils.profiling import forced_device_time

            probe = jax.jit(lambda w: w[..., :1].sum())

            def timeit(f):
                out = f(variables, mel)
                secs = forced_device_time(lambda: f(variables, mel), probe,
                                          iters=(3, 3 + args.iters))
                return secs, out

            xla_s, out_x = timeit(f_xla)
            pls_s, out_p = timeit(f_pls)
            err = float(jnp.abs(out_x - out_p).max())
            rows.append({
                "batch": B, "mel_frames": T,
                "samples": T * int(np.prod(cfg.upsample_rates)) * B,
                "xla_ms": round(1000 * xla_s, 2),
                "pallas_ms": round(1000 * pls_s, 2),
                "speedup": round(xla_s / pls_s, 3),
                "max_abs_diff": err,
            })
            print(rows[-1], file=sys.stderr, flush=True)
            assert err < 2e-3, f"pallas/XLA mismatch: {err}"

    print(json.dumps({"config": "hifigan-v1 medium", "rows": rows}))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
