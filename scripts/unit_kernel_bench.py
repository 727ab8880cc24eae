#!/usr/bin/env python
"""Time the unit-fused ghost-BN bottleneck vs the XLA batch-BN unit.

Runs fwd+bwd at the real pixellink_resnet50 stride-1 unit shapes
(batch 32, 512x512 input) on the live backend. Each timing wraps the op
in a lax.scan of `--reps` iterations inside one jit dispatch so the
tunnel round-trip amortizes away.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--blocks", default="1,2,3")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tensorflow_ocr_tpu.ops import pallas_unit as PU

    n = args.batch
    shapes = {
        "1": (128, 256, 64),
        "2": (64, 512, 128),
        "3": (32, 1024, 256),
        "4": (16, 2048, 512),
    }
    rng = np.random.RandomState(0)
    for b in args.blocks.split(","):
        h, ci, db = shapes[b]
        co = ci
        gh = PU.pick_gh(h, h, ci, db, co)
        if gh is None:
            print(f"block{b}: unsupported (no gh)")
            continue
        o = jnp.asarray(rng.randn(n, h, h, ci) * 0.5, jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(ci, db) * 0.05, jnp.bfloat16)
        gb1 = jnp.asarray(np.stack([np.ones(db), np.zeros(db)]),
                          jnp.float32)
        w2 = jnp.asarray(rng.randn(9 * db, db) * 0.05, jnp.bfloat16)
        w3 = jnp.asarray(rng.randn(db, co) * 0.05, jnp.bfloat16)
        gb3 = jnp.asarray(np.stack([np.ones(co), np.zeros(co)]),
                          jnp.float32)

        def one_fused(o):
            out, s1, s2, s3 = PU.ghost_unit_id(
                o, w1, gb1, w2, gb1, w3, gb3, gh, 1e-5)
            return out

        def one_xla(o):
            f32 = jnp.float32
            z1 = jax.lax.conv_general_dilated(
                o, w1[None, None], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            mu = jnp.mean(z1.astype(f32), (0, 1, 2))
            var = jnp.var(z1.astype(f32), (0, 1, 2))
            a = gb1[0] * jax.lax.rsqrt(var + 1e-5)
            act1 = jnp.maximum(z1.astype(f32) * a + (gb1[1] - mu * a),
                               0.0).astype(o.dtype)
            z2 = jax.lax.conv_general_dilated(
                act1, w2.reshape(3, 3, db, db), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            mu2 = jnp.mean(z2.astype(f32), (0, 1, 2))
            var2 = jnp.var(z2.astype(f32), (0, 1, 2))
            a2 = gb1[0] * jax.lax.rsqrt(var2 + 1e-5)
            act2 = jnp.maximum(z2.astype(f32) * a2 + (gb1[1] - mu2 * a2),
                               0.0).astype(o.dtype)
            z3 = jax.lax.conv_general_dilated(
                act2, w3[None, None], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            mu3 = jnp.mean(z3.astype(f32), (0, 1, 2))
            var3 = jnp.var(z3.astype(f32), (0, 1, 2))
            a3 = gb3[0] * jax.lax.rsqrt(var3 + 1e-5)
            out = jnp.maximum(
                z3.astype(f32) * a3 + (gb3[1] - mu3 * a3)
                + o.astype(f32), 0.0)
            return out.astype(o.dtype)

        def timed(unit_fn, tag):
            def step(carry, _):
                g = jax.grad(lambda o: jnp.sum(
                    unit_fn(o).astype(jnp.float32)) * 1e-3)(carry)
                return carry + g.astype(carry.dtype) * 1e-6, ()

            @jax.jit
            def run(o):
                out, _ = jax.lax.scan(step, o, None, length=args.reps)
                return out

            r = run(o)
            np.asarray(jax.device_get(r[0, 0, 0, :1]))  # compile+sync
            t0 = time.time()
            r = run(o)
            np.asarray(jax.device_get(r[0, 0, 0, :1]))
            dt = (time.time() - t0) / args.reps * 1000
            return dt

        t_f = timed(one_fused, "fused")
        t_x = timed(one_xla, "xla")
        print(f"block{b} (h={h}, ci={ci}, db={db}, gh={gh}): "
              f"fused {t_f:7.2f} ms/unit  xla {t_x:7.2f} ms/unit",
              flush=True)


if __name__ == "__main__":
    main()
