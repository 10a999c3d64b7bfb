"""Honest im2col vs native lax.conv timing for the model's 1-D conv shapes.

Round 1 replaced every 1-D conv with im2col matmuls after measuring XLA's
native conv lowering as ~1000x slower — but that measurement used
block_until_ready, which is not a fence on this backend (see
docs/PERFORMANCE.md "Backend quirks"). This re-measures both lowerings with
forced marginal timing (utils/profiling.py), forward and forward+backward,
at the decoder FFN shapes that dominate training FLOPs.

    python scripts/bench_conv_impl.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from zerovox_tpu.models.layers import conv1d_im2col
    from zerovox_tpu.utils.profiling import forced_device_time

    def conv1d_native(x, w, padding: int, dilation: int = 1):
        # x [B, T, C_in], w [k, C_in, C_out] -> [B, T', C_out]
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(padding, padding)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))

    rng = np.random.default_rng(0)
    probe = jax.jit(lambda t: jax.tree.leaves(t)[0].ravel()[:1].sum())

    cases = [
        # (name, B, T, C_in, C_out, k, dilation)
        ("dec FFN conv1 (k=9) B8", 8, 689, 528, 1024, 9, 1),
        ("dec FFN conv2 (k=1) B8", 8, 689, 1024, 528, 1, 1),
        ("dec FFN conv1 (k=9) B32", 32, 689, 528, 1024, 9, 1),
        ("vocoder resblock k=3 d=1 B1", 1, 22016, 128, 128, 3, 1),
        ("variance pred k=3 B8", 8, 689, 528, 256, 3, 1),
    ]

    for name, B, T, Cin, Cout, k, d in cases:
        x = jnp.asarray(rng.normal(size=(B, T, Cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, Cin, Cout)).astype(np.float32) * 0.02)
        pad = (k - 1) // 2 * d

        f_im = jax.jit(lambda x, w: conv1d_im2col(x, w, padding=pad, dilation=d))
        f_nat = jax.jit(lambda x, w: conv1d_native(x, w, padding=pad, dilation=d))

        # numerical agreement
        err = float(jnp.abs(f_im(x, w) - f_nat(x, w)).max())

        g_im = jax.jit(jax.grad(lambda w: f_im(x, w).sum()))
        g_nat = jax.jit(jax.grad(lambda w: f_nat(x, w).sum()))

        r = {}
        for label, fn, args in (("fwd_im2col", f_im, (x, w)),
                                ("fwd_native", f_nat, (x, w)),
                                ("bwd_im2col", g_im, (w,)),
                                ("bwd_native", g_nat, (w,))):
            fn(*args)
            secs = forced_device_time(lambda fn=fn, args=args: fn(*args), probe,
                                      iters=(3, 13))
            r[label] = secs * 1000
        flops = 2 * B * T * Cin * Cout * k
        print(f"{name}: max|diff|={err:.2e} "
              f"fwd im2col {r['fwd_im2col']:.2f} ms vs native {r['fwd_native']:.2f} ms; "
              f"grad im2col {r['bwd_im2col']:.2f} ms vs native {r['bwd_native']:.2f} ms "
              f"(fwd native {flops / max(r['fwd_native'], 1e-6) * 1e3 / 1e12:.1f} TFLOP/s)",
              file=sys.stderr, flush=True)

    # transposed conv: subpixel phase-matmul vs native input-dilated conv
    from zerovox_tpu.models.layers import conv_transpose1d_subpixel

    def convt_native(x, w, stride: int, padding: int):
        k = w.shape[0]
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,),
            padding=[(k - 1 - padding, k - 1 - padding)],
            lhs_dilation=(stride,),
            dimension_numbers=("NWC", "WIO", "NWC"))

    tcases = [
        ("vocoder ups0 k=16 s=8 B1", 1, 689, 512, 256, 16, 8),
        ("vocoder ups2 k=4 s=2 B1", 1, 44096, 128, 64, 4, 2),
    ]
    for name, B, T, Cin, Cout, k, s_ in tcases:
        x = jnp.asarray(rng.normal(size=(B, T, Cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, Cin, Cout)).astype(np.float32) * 0.02)
        pad = (k - s_) // 2
        f_sub = jax.jit(lambda x, w: conv_transpose1d_subpixel(x, w, s_, pad))
        f_nat = jax.jit(lambda x, w: convt_native(x, w, s_, pad))
        err = float(jnp.abs(f_sub(x, w) - f_nat(x, w)).max())
        r = {}
        for label, fn in (("subpixel", f_sub), ("native", f_nat)):
            fn(x, w)
            secs = forced_device_time(lambda fn=fn: fn(x, w), probe, iters=(3, 13))
            r[label] = secs * 1000
        print(f"{name}: max|diff|={err:.2e} "
              f"subpixel {r['subpixel']:.2f} ms vs native {r['native']:.2f} ms",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
