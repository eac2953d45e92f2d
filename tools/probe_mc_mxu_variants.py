#!/usr/bin/env python3
"""Probe: real-shape luma MC cost — VPU taps vs class-sorted MXU.

Times _luma_pred_tile (VPU lane slices) against mc_luma_mxu with
(a) the full two-sort general path (synthetic 16x16-class MV mix) and
(b) the single-class shortcut (constant MV), at 4K block counts with a
realistic tile table resident in HBM. Isolates what the stage profiler
can't: whether a regression lives in the sort, the gather, or the
matmuls.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass
    from libde265_tpu.ops.mc_tile_jax import _luma_pred_tile
    from libde265_tpu.ops.mc_mxu_jax import (mc_luma_mxu, caps_from_counts,
                                             luma_class_counts)

    H, W = 2160, 3840
    N = (H // 4) * (W // 4)
    nty, ntx = (H + 20) // 4, (W + 20) // 4
    R = 2
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 256, (R * nty * ntx, 256), np.uint8))
    bx = (np.arange(N, dtype=np.int32) % (W // 4)) * 4
    by = (np.arange(N, dtype=np.int32) // (W // 4)) * 4
    slot = rng.integers(0, R, N).astype(np.int32)
    F = 8

    def mv_case(kind):
        if kind == "mixed":
            mvx = rng.integers(-64, 64, N).astype(np.int32)
            mvy = rng.integers(-64, 64, N).astype(np.int32)
        else:
            mvx = np.full(N, -21, np.int32)
            mvy = np.full(N, 13, np.int32)
        hm = np.zeros(16, np.int64)
        vm = np.zeros(16, np.int64)
        hc, vc = luma_class_counts(
            np.stack([mvx, mvy], 1).astype(np.int64), H, W)
        caps = caps_from_counts(np.maximum(hm, hc), np.maximum(vm, vc))
        return jnp.asarray(mvx), jnp.asarray(mvy), caps

    def timeit(name, fn, *args):
        jfn = jax.jit(fn)
        t0 = time.time()
        r = jfn(*args)
        _ = float(jnp.asarray(r).ravel()[0])
        print(f"# {name}: compile+1st {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        for _ in range(4):
            r = jfn(*args)
        _ = float(jnp.asarray(r).ravel()[0])
        ms = (time.time() - t0) / (4 * F) * 1000.0
        print(json.dumps({"probe": name, "ms_per_frame": round(ms, 2)}),
              flush=True)

    def rep(fn):
        def go(*a):
            def step(c, _):
                return c + fn(*a), 0
            acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(F))
            return acc
        return go

    sl = jnp.asarray(slot)
    bxj, byj = jnp.asarray(bx), jnp.asarray(by)
    for kind in ("const", "mixed"):
        mvx, mvy, caps = mv_case(kind)
        timeit(f"mxu_{kind}", rep(
            lambda t, x, y, s: mc_luma_mxu(
                t, nty, ntx, bxj, byj, x, y, s, H, W, 0, caps, 8)
            .sum().astype(jnp.float32)), table, mvx, mvy, sl)
        if kind == "mixed":
            timeit("vpu_mixed", rep(
                lambda t, x, y, s: _luma_pred_tile(
                    t, nty, ntx, bxj, byj, x, y, s, H, W, 0)
                .sum().astype(jnp.float32)), table, mvx, mvy, sl)


if __name__ == "__main__":
    main()
