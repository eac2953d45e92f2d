#!/usr/bin/env python3
"""Probe 2: can the axon tunnel pipeline transfers?

  h2d_sync      : per-put latency incl. completion sync (round-1 number)
  h2d_pipelined : N puts issued back-to-back, one sync at the end — the
                  sustained rate if the driver overlaps puts
  h2d_overlap   : puts issued while a long device program runs — do
                  transfers and compute overlap?
  donate_step   : jit step with donated carry chained N times (decode-loop
                  shape) — dispatch cost when the carry stays on device
"""
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
    dev = jax.devices()[0]
    print(json.dumps({"devices": str(jax.devices())}), flush=True)

    MB = 1024 * 1024
    arrs = [np.random.randint(0, 100, (8 * MB // 4,), np.int32)
            for _ in range(8)]

    # warm
    d = jax.device_put(arrs[0]); float(d[0])

    # sync puts
    t0 = time.time()
    for a in arrs[:4]:
        d = jax.device_put(a); float(d[0])
    dt = time.time() - t0
    print(json.dumps({"probe": "h2d_sync_4x8MB", "ms": round(dt * 1e3, 1),
                      "MBps": round(32 / dt, 1)}), flush=True)

    # pipelined puts: issue all, sync once
    t0 = time.time()
    ds = [jax.device_put(a) for a in arrs]
    for d in ds:
        float(d[0])
    dt = time.time() - t0
    print(json.dumps({"probe": "h2d_pipe_8x8MB", "ms": round(dt * 1e3, 1),
                      "MBps": round(64 / dt, 1)}), flush=True)

    # long compute program (~1s of device time)
    x = jnp.zeros((2048, 2048), jnp.float32) + 1.0

    @jax.jit
    def burn(x):
        def body(i, x):
            return x @ x * 1e-3 + i * 1e-6
        return jax.lax.fori_loop(0, 2000, body, x)

    float(burn(x).sum())   # compile
    t0 = time.time()
    float(burn(x).sum())
    burn_s = time.time() - t0
    print(json.dumps({"probe": "burn_alone_s", "s": round(burn_s, 2)}), flush=True)

    # overlap: launch burn, then do puts, then sync both
    t0 = time.time()
    y = burn(x)
    ds = [jax.device_put(a) for a in arrs]
    for d in ds:
        float(d[0])
    t_puts_done = time.time() - t0
    float(y.sum())
    t_all = time.time() - t0
    print(json.dumps({"probe": "h2d_overlap", "puts_done_ms": round(t_puts_done * 1e3, 1),
                      "total_ms": round(t_all * 1e3, 1),
                      "overlap": t_all < burn_s + 64 / 65.0 * 0.8}), flush=True)

    # chained donated-carry step (decode-loop shape): carry 100MB on device
    carry = jnp.zeros((8, 1088, 1920), jnp.int32)

    @jax.jit
    def step(c, s):
        return jnp.roll(c, 1, axis=0) + s

    c = step(carry, 1); float(c[0, 0, 0])
    t0 = time.time()
    for i in range(20):
        c = step(c, i)
    float(c[0, 0, 0])
    dt = (time.time() - t0) / 20
    print(json.dumps({"probe": "chained_step_100MB_carry",
                      "ms": round(dt * 1e3, 2)}), flush=True)

    # d2h of one 4K frame (12.4MB u8)
    f = jnp.zeros((3840 * 2160 * 3 // 2,), jnp.uint8) + 1
    float(f[0])
    t0 = time.time()
    for _ in range(5):
        a = np.asarray(f)
    dt = (time.time() - t0) / 5
    print(json.dumps({"probe": "d2h_4Kframe_u8", "ms": round(dt * 1e3, 1),
                      "MBps": round(len(a) / MB / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
