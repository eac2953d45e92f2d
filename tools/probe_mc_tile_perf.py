#!/usr/bin/env python3
"""Time the tile-table MC at 4K on the real TPU: table build + full-frame
MC, amortized inside one fori_loop program (axon compile/dispatch excluded)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    from libde265_tpu.ops.mc_tile_jax import build_tables, mc_frame_tile

    H, W = 2176, 3840
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    ITERS = 10
    rng = np.random.RandomState(0)
    refs_y = jnp.asarray(rng.randint(0, 255, (R, H, W)).astype(np.int16))
    refs_cb = jnp.asarray(rng.randint(0, 255, (R, H // 2, W // 2)).astype(np.int16))
    refs_cr = jnp.asarray(rng.randint(0, 255, (R, H // 2, W // 2)).astype(np.int16))
    N = (H // 4) * (W // 4)
    mv = jnp.asarray(rng.randint(-256, 256, (N, 2, 2)).astype(np.int32))
    slot = jnp.asarray(rng.randint(0, R, (N, 2)).astype(np.int32))
    pf = jnp.asarray(np.stack([np.ones(N), rng.randint(0, 2, N)], 1).astype(np.int32))
    wts = jnp.zeros((N, 3, 5), jnp.int32)
    ex = jnp.zeros((N,), bool)

    @jax.jit
    def run(refs_y, refs_cb, refs_cr, mv, slot, pf, wts, ex):
        def body(i, acc):
            tabs = build_tables(refs_y + (i & 1), refs_cb, refs_cr)
            planes = mc_frame_tile(tabs, (H, W), mv, slot, pf, wts, ex, 8)
            return acc + planes[0].sum(dtype=jnp.int32) \
                + planes[1].sum(dtype=jnp.int32) + planes[2].sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    t0 = time.time()
    chk = int(run(refs_y, refs_cb, refs_cr, mv, slot, pf, wts, ex))
    compile_s = time.time() - t0
    t0 = time.time()
    chk = int(run(refs_y, refs_cb, refs_cr, mv, slot, pf, wts, ex))
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"probe": f"mc_tile_4k_R{R}", "ms_per_frame": round(dt * 1e3, 2),
                      "fps": round(1 / dt, 1), "compile_s": round(compile_s, 1),
                      "chk": chk}), flush=True)

    # table build alone
    @jax.jit
    def run_tab(refs_y, refs_cb, refs_cr):
        def body(i, acc):
            tabs = build_tables(refs_y + (i & 1), refs_cb, refs_cr)
            return acc + tabs[0][0, 0].astype(jnp.int32) + tabs[1][0, 0] + tabs[1][0, 64]
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    int(run_tab(refs_y, refs_cb, refs_cr))
    t0 = time.time()
    int(run_tab(refs_y, refs_cb, refs_cr))
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"probe": f"tables_only_R{R}", "ms": round(dt * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
