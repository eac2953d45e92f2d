#!/usr/bin/env python3
"""Micro-bench the in-place tile-table update kernel at 4K on the real
TPU, A/B-ing transpose dtypes (int32 vs int16) — the transpose dominates
the kernel (~10.5 ms/frame in the stage profile, 40x off the HBM floor).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from libde265_tpu.ops.mc_tile_jax import (n_tiles_y, n_tiles_c,
                                              PAD_Y, PAD_C)
    from libde265_tpu.ops.pallas.mc_tables import update_tile_table_pallas

    H, W = 2160, 3840
    NS = 8
    ry = int(np.prod(n_tiles_y(H, W)))
    rc = int(np.prod(n_tiles_c(H // 2, W // 2)))
    rng = np.random.RandomState(0)
    ty = jnp.asarray(rng.randint(0, 255, (NS * ry, 256)).astype(np.uint8))
    tc = jnp.asarray(rng.randint(0, 255, (NS * rc, 128)).astype(np.uint8))
    py = jnp.asarray(rng.randint(0, 255, (1, H + 2 * PAD_Y, W + 2 * PAD_Y))
                     .astype(np.int16))
    pc = jnp.asarray(rng.randint(0, 255,
                     (2, H // 2 + 2 * PAD_C, W // 2 + 2 * PAD_C))
                     .astype(np.int16))

    ITERS = 20

    @jax.jit
    def run(ty, tc, py, pc):
        def body(i, carry):
            ty, tc = carry
            ty = update_tile_table_pallas(ty, py + (i & 1), i % NS, 16)
            tc = update_tile_table_pallas(tc, pc, i % NS, 8)
            return ty, tc
        return jax.lax.fori_loop(0, ITERS, body, (ty, tc))

    o = run(ty, tc, py, pc)
    float(o[0][0, 0])
    t0 = time.time()
    o = run(*o, py, pc)
    float(o[0][0, 0])
    dt = time.time() - t0
    mb = (ty.nbytes + tc.nbytes) / NS / 1e6
    print(f"update y+c: {dt/ITERS*1000:.2f} ms/frame "
          f"({mb:.0f} MB written/frame -> {mb/(dt/ITERS)/1000:.0f} GB/s)")


if __name__ == "__main__":
    main()
