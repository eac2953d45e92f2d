#!/usr/bin/env python3
"""Probe host->device transfer / compute overlap on the axon tunnel.

Strategies for sustaining `upload blob; dispatch scan` pipelines:
  serial   : dispatch; device_put on the main thread (bench.py today)
  thread   : dispatch; device_put on a worker thread, join pre-dispatch
  prefetch2: two blob buffers, upload r+1 issued right after dispatch r
             from a persistent worker (steady-state double buffering)
Reports seconds per round for each against the compute-only floor.
"""
import os
import sys
import time
import threading

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
import jax
import jax.numpy as jnp


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass
    MB = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    blob = {"a": np.random.randint(0, 127, (MB << 20,), np.int8)}
    # compute kernel ~ the 4K scan's per-round cost (~200ms): chained matmuls
    x = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def work(x, steps=64):
        def f(c, _):
            return c @ c * 1e-4, 0
        c, _ = jax.lax.scan(f, x, None, length=steps)
        return c

    work(x).block_until_ready()
    t0 = time.time()
    for _ in range(4):
        x = work(x)
    float(x[0, 0]); t_comp = (time.time() - t0) / 4
    t0 = time.time()
    for _ in range(4):
        sd = jax.device_put(blob)
        float(sd["a"][0])
    t_up = (time.time() - t0) / 4
    print(f"compute-only {t_comp*1e3:.1f} ms/round, "
          f"upload-only {t_up*1e3:.1f} ms ({MB} MB)", flush=True)

    # serial
    t0 = time.time()
    for _ in range(6):
        x = work(x)
        sd = jax.device_put(blob)
    float(x[0, 0])
    print(f"serial    {(time.time()-t0)/6*1e3:.1f} ms/round", flush=True)

    # thread
    t0 = time.time()
    for _ in range(6):
        x = work(x)
        box = {}
        th = threading.Thread(
            target=lambda: box.setdefault("sd", jax.device_put(blob)))
        th.start()
        th.join()
    float(x[0, 0])
    print(f"thread    {(time.time()-t0)/6*1e3:.1f} ms/round", flush=True)

    # prefetch: upload issued while previous round's compute still queued
    th = None
    t0 = time.time()
    for r in range(6):
        x = work(x)
        if th:
            th.join()
        th = threading.Thread(
            target=lambda: jax.device_put(blob))
        th.start()
    th.join()
    float(x[0, 0])
    print(f"prefetch  {(time.time()-t0)/6*1e3:.1f} ms/round", flush=True)


if __name__ == "__main__":
    main()
