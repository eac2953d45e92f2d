#!/usr/bin/env python3
"""Probe: can the MC tap passes run as MXU matmuls?

Idea: host sorts the per-4x4-block gather order by (fractional phase,
misalignment) class; within a class the shifted-tap vectors are CONSTANT,
so each pass is a dense (Nc, 256) @ (256, 80) matmul with a banded class
matrix — MXU work instead of 11 shifted VPU multiply-adds. bf16 x bf16 ->
f32 is bit-exact for 8-bit video (samples <= 255 and |taps| <= 58 are
exact in bf16; every product < 2^15 and accumulation < 2^22 exact in the
f32 accumulator); 10-bit uses f32 x f32 (samples < 2^24).

This measures the raw ingredient rates on the bench-stream shapes:
  h-pass matmul (bf16 and f32), v-pass matmul, inter-pass row permute,
  and the end-to-end gather -> h -> permute -> v chain.
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

    H, W = 2160, 3840
    N = (H // 4) * (W // 4)            # 518400 4x4 blocks
    Np = -(-N // 1024) * 1024
    nrows = 2 * ((H + 20) // 4) * ((W + 20) // 4)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 256, (nrows, 256), np.uint8))
    idx = jnp.asarray(rng.integers(0, nrows, Np, np.int32))
    perm = jnp.asarray(rng.permutation(Np).astype(np.int32))
    Wh = jnp.asarray(rng.integers(-11, 59, (256, 80), np.int8))
    Wv = jnp.asarray(rng.integers(-11, 59, (80, 64), np.int8))
    F = 8                               # frames per dispatch (amortize sync)

    def timeit(name, fn, *args):
        jfn = jax.jit(fn)
        t0 = time.time()
        r = jfn(*args)
        _ = float(jnp.asarray(r).ravel()[0])
        print(f"# {name}: compile+1st {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        rounds = 4
        for _ in range(rounds):
            r = jfn(*args)
        _ = float(jnp.asarray(r).ravel()[0])
        ms = (time.time() - t0) / (rounds * F) * 1000.0
        print(json.dumps({"probe": name, "ms_per_frame": round(ms, 3)}),
              flush=True)

    def rep(fn):
        def go(*a):
            acc = jnp.float32(0)
            def step(c, _):
                return c + fn(*a), 0
            acc, _ = jax.lax.scan(step, acc, jnp.arange(F))
            return acc
        return go

    timeit("gather_only", rep(lambda t, i: t[i].astype(jnp.int32).sum()
                              .astype(jnp.float32)), table, idx)

    def h_bf16(t, i, w):
        win = t[i].astype(jnp.bfloat16)
        return jnp.matmul(win, w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).sum()
    timeit("gather_h_bf16", rep(h_bf16), table, idx, Wh)

    def h_f32(t, i, w):
        win = t[i].astype(jnp.float32)
        return jnp.matmul(win, w.astype(jnp.float32)).sum()
    timeit("gather_h_f32", rep(h_f32), table, idx, Wh)

    def chain(t, i, p, wh, wv):
        win = t[i].astype(jnp.bfloat16)
        tmp = jnp.matmul(win, wh.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)  # (Np,80) f32
        tmp = tmp[p]                                    # class re-sort
        out = jnp.matmul(tmp, wv.astype(jnp.float32))   # (Np,64) f32
        return out.sum()
    timeit("chain_full", rep(chain), table, idx, perm, Wh, Wv)

    def chain_noperm(t, i, wh, wv):
        win = t[i].astype(jnp.bfloat16)
        tmp = jnp.matmul(win, wh.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        out = jnp.matmul(tmp, wv.astype(jnp.float32))
        return out.sum()
    timeit("chain_noperm", rep(chain_noperm), table, idx, Wh, Wv)


if __name__ == "__main__":
    main()
