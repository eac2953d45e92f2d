#!/usr/bin/env python3
"""Discriminate the fused-intra per-level cost on TPU: is the ~0.9 ms
per level the border GATHER, the block SCATTER, or a whole-carry copy?
Runs a fori_loop of synthetic class_steps with each half ablated."""
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
    H, W = 2160, 3840
    SZ = H * W + 1
    K, L, n = 64, 65, 16
    C = 1000
    rng = np.random.RandomState(0)
    gi = jnp.asarray(rng.randint(0, SZ - 1, (C, K, L)).astype(np.int32))
    # disjoint-ish scatter targets per level
    didx = jnp.asarray(rng.randint(0, SZ - 1, (C, K * n * n))
                       .astype(np.int32))
    vals = jnp.asarray(rng.randint(0, 255, (C, K * n * n))
                       .astype(np.int32))

    def run(name, body):
        f = jax.jit(lambda flat: jax.lax.fori_loop(0, C, body, flat))
        flat = jnp.zeros(SZ, jnp.int32)
        r = f(flat)
        float(r[0])
        t0 = time.time()
        r = f(r)
        float(r[0])
        dt = (time.time() - t0) / C * 1e6
        print(f"{name}: {dt:.0f} us/level")

    def both(i, flat):
        raw = flat[gi[i]]
        v = vals[i] + raw.sum().astype(jnp.int32)
        return flat.at[didx[i]].set(v, mode="drop", unique_indices=True)

    def gather_only(i, flat):
        raw = flat[gi[i]]
        return flat.at[0].set(raw.sum().astype(jnp.int32))

    def scatter_only(i, flat):
        return flat.at[didx[i]].set(vals[i] + i, mode="drop",
                                    unique_indices=True)

    def neither(i, flat):
        return flat.at[0].set(i)

    run("gather+scatter", both)
    run("gather only", gather_only)
    run("scatter only", scatter_only)
    run("neither", neither)


if __name__ == "__main__":
    main()
