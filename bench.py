#!/usr/bin/env python3
"""Benchmark: TPU device-side reconstruction throughput at 4K.

Measures the device pipeline (batched dequant + inverse DCT for a realistic
4K TU mix + residual scatter + boundary filtering) in frames/second on one
chip, against the reference's published 4K software decode rate (36 fps,
/root/reference/README.md:40 — see BASELINE.md).

The whole measurement is ONE compiled program (an internal fori_loop over
frames, chained on the frame carry) returning a checksum that forces
execution: per-call dispatch and (slow tunneled) compile time are excluded,
device time is included.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
    except Exception:
        pass
    import jax.numpy as jnp
    from libde265_tpu.ops.transform_jax import residual_batch

    H, W = 2176, 3840          # 4K padded to CTB
    ITERS = 20
    rng = np.random.RandomState(0)

    classes = [(2, 40000), (3, 16000), (4, 5000), (5, 800)]
    batches = []
    flat = []
    for log2, n_tu in classes:
        n = 1 << log2
        coeffs = jnp.asarray(rng.randint(-128, 128, (n_tu, n, n)).astype(np.int32))
        qp = jnp.asarray(np.full((n_tu,), 32, np.int32))
        xs = jnp.asarray((rng.randint(0, W // n, (n_tu,)) * n).astype(np.int32))
        ys = jnp.asarray((rng.randint(0, H // n, (n_tu,)) * n).astype(np.int32))
        batches.append(log2)
        flat += [coeffs, qp, xs, ys]
    plane0 = jnp.asarray(rng.randint(0, 255, (H, W)).astype(np.int32))

    def frame_step(plane, flat_args):
        # TU residuals: per size class, row-scatter blocks into a slot table
        # (slots are unique: TUs never overlap), then reshape into a full
        # residual plane — avoids elementwise 2-D scatter, which XLA
        # serializes badly on TPU.
        it = iter(flat_args)
        acc = jnp.zeros((H, W), jnp.int32)
        for log2 in batches:
            n = 1 << log2
            coeffs, qp, xs, ys = next(it), next(it), next(it), next(it)
            res = residual_batch(coeffs, qp, log2, False, 8)   # (N,n,n)
            rows = res.reshape(res.shape[0], n * n)
            slots = (ys >> log2) * (W >> log2) + (xs >> log2)
            table = jnp.zeros(((H >> log2) * (W >> log2), n * n), jnp.int32)
            table = table.at[slots].set(rows, unique_indices=True)
            rp = table.reshape(H >> log2, W >> log2, n, n)
            rp = rp.transpose(0, 2, 1, 3).reshape(H, W)
            acc = acc + rp
        plane = jnp.clip(plane + acc, 0, 255)
        # boundary smoothing via lane-group reshape (deblock-shaped traffic)
        r = plane.reshape(H, W // 8, 8)
        p0 = r[:, :-1, 7]
        q0 = r[:, 1:, 0]
        delta = jnp.clip((9 * (q0 - p0) + 8) >> 4, -4, 4)
        r = r.at[:, :-1, 7].set(jnp.clip(p0 + delta, 0, 255))
        r = r.at[:, 1:, 0].set(jnp.clip(q0 - delta, 0, 255))
        return r.reshape(H, W)

    @jax.jit
    def run(plane, *flat_args):
        def body(i, p):
            # rotate the plane by the loop index so iterations can't be fused
            return frame_step(p, flat_args) + (i & 1)
        out = jax.lax.fori_loop(0, ITERS, body, plane)
        return jnp.sum(out, dtype=jnp.int32)

    # warmup/compile
    t0 = time.time()
    chk = int(run(plane0, *flat))
    compile_s = time.time() - t0
    # timed run
    t0 = time.time()
    chk = int(run(plane0, *flat))
    dt = (time.time() - t0) / ITERS
    fps = 1.0 / dt
    baseline = 36.0
    print(json.dumps({
        "metric": "tpu_4k_recon_pipeline_fps",
        "value": round(fps, 2),
        "unit": "frames/s (device residual+filter pipeline, 4K)",
        "vs_baseline": round(fps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
