#!/usr/bin/env python
"""Microbenchmark: fused Pallas conv kernels vs XLA composition, per layer.

Times forward and forward+backward at the real pixellink_resnet50
bottleneck shapes (batch 32, 512x512 input) on the live backend.
Usage: python scripts/fused_kernel_bench.py [--batch 32] [--fwd-only]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jtu = out[0] if isinstance(out, tuple) else out
    np.asarray(jtu.ravel()[0])  # sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jtu = out[0] if isinstance(out, tuple) else out
    np.asarray(jtu.ravel()[0])
    return (time.time() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tensorflow_ocr_tpu.ops import pallas_fused as PF

    n = args.batch
    # (h, ci, co, kernel) for each distinct stride-1 bottleneck conv shape
    layers = [
        ("b1.c1 1x1", 128, 256, 64, (1, 1)),
        ("b1.c2 3x3", 128, 64, 64, (3, 3)),
        ("b1.c3 1x1", 128, 64, 256, (1, 1)),
        ("b2.c1 1x1", 64, 512, 128, (1, 1)),
        ("b2.c2 3x3", 64, 128, 128, (3, 3)),
        ("b2.c3 1x1", 64, 128, 512, (1, 1)),
        ("b3.c1 1x1", 32, 1024, 256, (1, 1)),
        ("b3.c2 3x3", 32, 256, 256, (3, 3)),
        ("b3.c3 1x1", 32, 256, 1024, (1, 1)),
        ("b4.c2 3x3", 16, 512, 512, (3, 3)),
    ]
    rng = np.random.RandomState(0)
    for name, h, ci, co, kern in layers:
        x = jnp.asarray(rng.randn(n, h, h, ci) * 0.5, jnp.bfloat16)
        ab = jnp.asarray(
            np.stack([np.ones(ci), np.zeros(ci)]), jnp.float32)
        if kern == (1, 1):
            w = jnp.asarray(rng.randn(ci, co) * 0.05, jnp.bfloat16)
            bm = PF.pick_bm(n * h * h, ci, co)
            if bm is None:
                print(f"{name}: unsupported (no bm)")
                continue
            fused = jax.jit(lambda x, ab, w: PF.fused_conv1x1(x, ab, w, bm))
            wk = w
        else:
            wk = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, jnp.bfloat16)
            w = wk.reshape(9 * ci, co)
            th = PF.pick_th(h, h, ci, co)
            if th is None:
                print(f"{name}: unsupported (no th)")
                continue
            fused = jax.jit(lambda x, ab, w: PF.fused_conv3x3(x, ab, w, th))
        ref = jax.jit(
            lambda x, ab, w: PF.reference_conv_bn_act(x, ab, w, kern))

        t_f = timeit(fused, x, ab, w, iters=args.iters)
        t_r = timeit(ref, x, ab, wk if kern == (3, 3) else w,
                     iters=args.iters)
        line = f"{name:12s} fwd: fused {t_f:7.2f} ms  xla {t_r:7.2f} ms"

        if not args.fwd_only:
            wy = 0.001
            gf = jax.jit(jax.grad(
                lambda x, ab, w: jnp.sum(fused(x, ab, w)[0].astype(
                    jnp.float32)) * wy, argnums=(0, 1, 2)))
            gr = jax.jit(jax.grad(
                lambda x, ab, w: jnp.sum(ref(x, ab, w)[0].astype(
                    jnp.float32)) * wy, argnums=(0, 1, 2)))
            t_gf = timeit(gf, x, ab, w, iters=args.iters)
            t_gr = timeit(gr, x, ab, wk if kern == (3, 3) else w,
                          iters=args.iters)
            line += f" | fwd+bwd: fused {t_gf:7.2f} ms  xla {t_gr:7.2f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
