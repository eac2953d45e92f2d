#!/usr/bin/env python3
"""Kernel differential-check + micro-benchmark harness (counterpart of
/root/reference/acceleration-speed/): every device op is checked against its
scalar/numpy reference on random blocks and timed.

Usage: python tools/acceleration_speed.py [--check] [--time] [--kernel NAME]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, sync, iters=20):
    fn(); sync()
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    sync()
    return (time.time() - t0) / iters


def check_transform(args, rng):
    import jax.numpy as jnp
    from libde265_tpu.ops import transform_ref, transform_jax
    results = []
    for log2 in (2, 3, 4, 5):
        n = 1 << log2
        N = 2048
        coeffs = rng.randint(-3000, 3000, (N, n, n)).astype(np.int32)
        qps = rng.randint(0, 52, N).astype(np.int32)
        dev = np.asarray(transform_jax.residual_batch(
            jnp.asarray(coeffs), jnp.asarray(qps), log2, False, 8))
        if args.check:
            for i in range(0, N, 97):
                ref = transform_ref.scale_and_inv_transform(
                    coeffs[i], int(qps[i]), log2, False, False, False)
                assert np.array_equal(dev[i], ref), f"idct{n} mismatch @ {i}"
        if args.time:
            cj, qj = jnp.asarray(coeffs), jnp.asarray(qps)
            dt = _time(lambda: transform_jax.residual_batch(cj, qj, log2, False, 8),
                       lambda: None)
            results.append((f"idct{n}x{n} x{N}", dt))
        print(f"transform {n}x{n}: OK")
    return results


def check_mc(args, rng):
    import jax.numpy as jnp
    from libde265_tpu.ops import inter_ref, inter_jax
    ref_plane = rng.randint(0, 255, (512, 512)).astype(np.int32)
    results = []
    for (w, h) in ((8, 8), (16, 16), (32, 32), (64, 64)):
        N = 256
        xs = rng.randint(-8, 480, N).astype(np.int32)
        ys = rng.randint(-8, 480, N).astype(np.int32)
        fx = rng.randint(0, 4, N).astype(np.int32)
        fy = rng.randint(0, 4, N).astype(np.int32)
        slot = np.zeros(N, np.int32)
        stack = jnp.asarray(ref_plane[None])
        dev = np.asarray(inter_jax.mc_luma_batch(
            stack, jnp.asarray(slot), jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(fx), jnp.asarray(fy), w, h))
        if args.check:
            for i in range(0, N, 37):
                mv = (int(fx[i]), int(fy[i]))
                ref = inter_ref.mc_luma(ref_plane, int(xs[i]), int(ys[i]), w, h,
                                        (int(fx[i]), int(fy[i])))
                assert np.array_equal(dev[i], ref), f"qpel {w}x{h} @ {i}"
        print(f"mc_luma {w}x{h}: OK")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", default=True)
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--kernel", default="all")
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    if args.kernel in ("all", "transform"):
        check_transform(args, rng)
    if args.kernel in ("all", "mc"):
        check_mc(args, rng)
    print("all kernels verified against scalar reference")


if __name__ == "__main__":
    sys.exit(main())
