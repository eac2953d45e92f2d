#!/usr/bin/env python3
"""Probe the axon tunnel: per-dispatch latency, host->device and
device->host transfer bandwidth. These set the budget for how the
per-frame decode pipeline must be batched (one program vs several) and
how compact plan tensors must be."""
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

    @jax.jit
    def tiny(x):
        return x + 1

    x = jnp.zeros((8, 128), jnp.int32)
    float(tiny(x).sum())          # compile
    t0 = time.time()
    REP = 50
    for _ in range(REP):
        x = tiny(x)
    float(x.sum())
    print(json.dumps({"probe": "dispatch_chain", "ms": round((time.time() - t0) / REP * 1e3, 2)}), flush=True)

    # dispatch with host sync each call (worst case)
    t0 = time.time()
    for _ in range(20):
        float(tiny(x).sum())
    print(json.dumps({"probe": "dispatch_sync", "ms": round((time.time() - t0) / 20 * 1e3, 2)}), flush=True)

    # host->device
    for mb in (1, 8, 32):
        a = np.random.randint(0, 100, (mb * 1024 * 1024 // 4,), np.int32)
        d = jax.device_put(a); float(d.sum())    # warm path
        t0 = time.time()
        for _ in range(5):
            d = jax.device_put(a)
            float(d[0])   # force completion of the put
        dt = (time.time() - t0) / 5
        print(json.dumps({"probe": f"h2d_{mb}MB", "ms": round(dt * 1e3, 1),
                          "MBps": round(mb / dt, 1)}), flush=True)

    # device->host
    for mb in (1, 8, 32):
        d = jnp.zeros((mb * 1024 * 1024 // 4,), jnp.int32) + 1
        float(d.sum())
        t0 = time.time()
        for _ in range(5):
            a = np.asarray(d)
        dt = (time.time() - t0) / 5
        print(json.dumps({"probe": f"d2h_{mb}MB", "ms": round(dt * 1e3, 1),
                          "MBps": round(mb / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
