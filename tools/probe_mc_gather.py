#!/usr/bin/env python3
"""Probe: motion-compensation gather strategies on the real TPU.

The round-1 dense MC gathers (N, 11, 11) windows with per-block fancy
indices; XLA serializes that gather (~0.44 fps for 4K luma MC alone).
This probe times the candidate replacements at 4K-luma scale so the
device-resident pipeline can be designed on data:

  patch11   : round-1 style per-block 11x11 window gather (1080p scale,
              extrapolated) — the baseline to beat
  tile16    : aligned 4x4-tile row-gather from a (T,16) table, 4 gathers
              per block + recombine (phase-separated MC design)
  tile64    : same but 8x8 tiles (T,64), 9 gathers (raw-window design)
  flat_pix  : per-pixel flat 1-D take (phase-separated, per-pixel index)
  convs15   : 15 separable 8-tap shifted-add convolutions over the full
              plane (the phase-separation precompute per reference frame)

Run:  python tools/probe_mc_gather.py [variant ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

H, W = 2176, 3840            # 4K padded
NBY, NBX = H // 4, W // 4
N = NBY * NBX                # 522240 4x4 blocks
R = 2                        # refs
ITERS = 8


def timed(fn, *args):
    import jax
    t0 = time.time()
    chk = float(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    chk = float(fn(*args))
    dt = (time.time() - t0) / ITERS
    return dt, compile_s, chk


def probe_tile16():
    import jax, jax.numpy as jnp
    T = R * 16 * (H // 4) * (W // 4)          # tiles in PF stack
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randint(0, 1 << 14, (T, 16)).astype(np.int32))
    base = jnp.asarray(rng.randint(0, T - (W // 4) - 2, (N,)).astype(np.int32))

    @jax.jit
    def run(table, base):
        def body(i, acc):
            b = base + (i & 1)
            g = (table[b] + table[b + 1] +
                 table[b + (W // 4)] + table[b + (W // 4) + 1])
            return acc + jnp.sum(g, dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return timed(run, table, base)


def probe_tile16_take():
    import jax, jax.numpy as jnp
    T = R * 16 * (H // 4) * (W // 4)
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randint(0, 1 << 14, (T, 16)).astype(np.int32))
    base = jnp.asarray(rng.randint(0, T - (W // 4) - 2, (N,)).astype(np.int32))

    @jax.jit
    def run(table, base):
        def body(i, acc):
            b = base + (i & 1)
            g = sum(jnp.take(table, b + o, axis=0, unique_indices=False,
                             indices_are_sorted=False)
                    for o in (0, 1, W // 4, W // 4 + 1))
            return acc + jnp.sum(g, dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return timed(run, table, base)


def probe_tile64():
    import jax, jax.numpy as jnp
    T = R * (H // 8) * (W // 8)               # 8x8 tiles of raw refs
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randint(0, 1 << 14, (T, 64)).astype(np.int32))
    base = jnp.asarray(rng.randint(0, T - 2 * (W // 8) - 3, (N,)).astype(np.int32))

    @jax.jit
    def run(table, base):
        def body(i, acc):
            b = base + (i & 1)
            g = 0
            for dy in range(3):
                for dx in range(3):
                    g = g + table[b + dy * (W // 8) + dx]
            return acc + jnp.sum(g, dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return timed(run, table, base)


def probe_flat_pix():
    import jax, jax.numpy as jnp
    S = R * 16 * H * W
    rng = np.random.RandomState(0)
    flat = jnp.asarray(rng.randint(0, 1 << 14, (S,)).astype(np.int32))
    idx = jnp.asarray(rng.randint(0, S - 2, (H * W,)).astype(np.int32))

    @jax.jit
    def run(flat, idx):
        def body(i, acc):
            g = jnp.take(flat, idx + (i & 1))
            return acc + jnp.sum(g, dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return timed(run, flat, idx)


def probe_patch11():
    import jax, jax.numpy as jnp
    # 1080p scale (4K crashed the tunneled worker in round 1)
    Hs, Ws = 1088, 1920
    Ns = (Hs // 4) * (Ws // 4)
    rng = np.random.RandomState(0)
    refs = jnp.asarray(rng.randint(0, 255, (R, Hs, Ws)).astype(np.int32))
    y0 = jnp.asarray(rng.randint(0, Hs - 12, (Ns,)).astype(np.int32))
    x0 = jnp.asarray(rng.randint(0, Ws - 12, (Ns,)).astype(np.int32))
    slot = jnp.asarray(rng.randint(0, R, (Ns,)).astype(np.int32))

    @jax.jit
    def run(refs, y0, x0, slot):
        def body(i, acc):
            rows = y0[:, None] + jnp.arange(11)[None, :] + (i & 1)
            cols = x0[:, None] + jnp.arange(11)[None, :]
            win = refs[slot[:, None, None], rows[:, :, None], cols[:, None, :]]
            return acc + jnp.sum(win, dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return timed(run, refs, y0, x0, slot)


def probe_convs15():
    import jax, jax.numpy as jnp
    rng = np.random.RandomState(0)
    plane = jnp.asarray(rng.randint(0, 255, (H, W)).astype(np.int32))
    taps = jnp.asarray(np.array([[-1, 4, -10, 58, 17, -5, 1, 0],
                                 [-1, 4, -11, 40, 40, -11, 4, -1],
                                 [0, 1, -5, 17, 58, -10, 4, -1]], np.int32))

    @jax.jit
    def run(plane, taps):
        def hconv(p, t):
            pad = jnp.pad(p, ((0, 0), (3, 4)), mode="edge")
            return sum(t[k] * pad[:, k:k + W] for k in range(8)) >> 6

        def vconv(p, t):
            pad = jnp.pad(p, ((3, 4), (0, 0)), mode="edge")
            return sum(t[k] * pad[k:k + H, :] for k in range(8)) >> 6

        def body(i, acc):
            p = plane + (i & 1)
            hs = [p] + [hconv(p, taps[j]) for j in range(3)]
            s = jnp.int32(0)
            for hp in hs:
                for j in range(3):
                    s = s + jnp.sum(vconv(hp, taps[j]), dtype=jnp.int32)
                s = s + jnp.sum(hp, dtype=jnp.int32)
            return acc + s
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return timed(run, plane, taps)


VARIANTS = {
    "tile16": probe_tile16,
    "tile16_take": probe_tile16_take,
    "tile64": probe_tile64,
    "flat_pix": probe_flat_pix,
    "patch11": probe_patch11,
    "convs15": probe_convs15,
}


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    except Exception:
        pass
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            dt, compile_s, chk = VARIANTS[name]()
            print(json.dumps({"variant": name, "ms_per_iter": round(dt * 1e3, 2),
                              "compile_s": round(compile_s, 1), "chk": chk}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)




def probe_tile256():
    import jax, jax.numpy as jnp
    # 16x16 overlapping tiles anchored per 4x4 block: 1 gather of (N,256)
    T = R * (H // 4) * (W // 4)
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randint(0, 1 << 14, (T, 256)).astype(np.int32))
    base = jnp.asarray(rng.randint(0, T - 2, (N,)).astype(np.int32))

    @jax.jit
    def run(table, base):
        def body(i, acc):
            g = table[base + (i & 1)]
            return acc + jnp.sum(g, dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return timed(run, table, base)


def probe_tile256_local():
    import jax, jax.numpy as jnp
    # same but spatially-local (mostly ascending) indices, like real MVs
    T = R * (H // 4) * (W // 4)
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randint(0, 1 << 14, (T, 256)).astype(np.int32))
    idx = np.arange(N) % (T - 64) + rng.randint(0, 63, N)
    base = jnp.asarray(idx.astype(np.int32))

    @jax.jit
    def run(table, base):
        def body(i, acc):
            g = table[base + (i & 1)]
            return acc + jnp.sum(g, dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return timed(run, table, base)


def probe_tile1024():
    import jax, jax.numpy as jnp
    # 32x32 tiles anchored per 16x16 block: 1 gather of (N/16,1024)
    T = R * (H // 16) * (W // 16)
    N16 = N // 16
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randint(0, 1 << 14, (T, 1024)).astype(np.int32))
    base = jnp.asarray(rng.randint(0, T - 2, (N16,)).astype(np.int32))

    @jax.jit
    def run(table, base):
        def body(i, acc):
            g = table[base + (i & 1)]
            return acc + jnp.sum(g, dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return timed(run, table, base)


def probe_tile256_i16():
    import jax, jax.numpy as jnp
    T = R * (H // 4) * (W // 4)
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randint(0, 1 << 14, (T, 256)).astype(np.int16))
    base = jnp.asarray(rng.randint(0, T - 2, (N,)).astype(np.int32))

    @jax.jit
    def run(table, base):
        def body(i, acc):
            g = table[base + (i & 1)].astype(jnp.int32)
            return acc + jnp.sum(g, dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    return timed(run, table, base)


VARIANTS.update({
    "tile256": probe_tile256,
    "tile256_local": probe_tile256_local,
    "tile1024": probe_tile1024,
    "tile256_i16": probe_tile256_i16,
})
if __name__ == "__main__":
    main()
