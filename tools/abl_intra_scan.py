#!/usr/bin/env python3
"""Ablation timing of the intra band-scan kernel on the real TPU:
synthetic 4K-IDR-like load (32400 luma 16x16 TUs), one variant per
listed ablation. Usage: python tools/abl_intra_scan.py [variant ...]
Variants: full noasm nosub nodot noscat empty
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from libde265_tpu.ops.pallas.intra_scan import build_scan, pack_rec, pack_span

H, W = 2160, 3840
BH, C, NB, K = 64, 30, 34, 1024
log2 = 4
n = 16
RW = 256
rng = np.random.RandomState(0)

# TU records: full 16x16 tiling in band-major raster order (valid intra
# decode order for a one-tile frame)
recs = []
for band in range(NB):
    for yy in range(band * BH, min((band + 1) * BH, H), n):
        for xx in range(0, W, n):
            recs.append((xx, yy % BH, band))
slots = np.full(NB * K, -1, np.int64)
scal = np.zeros(NB * K, np.int32)
cnt = np.zeros(NB, np.int64)
modes = rng.randint(0, 35, len(recs))
ft = np.ones(35, np.int32)
ft[[1, 10, 26, 25, 27, 9, 11]] = 0
for i, (xx, yin, band) in enumerate(recs):
    s = band * K + cnt[band]
    cnt[band] += 1
    scal[s] = pack_rec(xx, yin, 0, int(modes[i]), 1, int(ft[modes[i]]))
print(f"# {len(recs)} TUs over {NB}x{K} slots", flush=True)

avail = (rng.rand(NB * K, 256) < 0.9).astype(np.int32)
spans = np.full(NB * K, pack_span(1, 65, 1, 0), np.int32)  # span fast path
rowg = np.arange(NB * K, dtype=np.int32) % (NB * K)
resid = rng.randint(-40, 40, (NB * K, RW)).astype(np.int32)
plane = rng.randint(0, 256, (NB * BH, C, 128)).astype(np.int32)

sj = jax.device_put(jnp.asarray(scal))
spj = jax.device_put(jnp.asarray(spans))
gj = jax.device_put(jnp.asarray(rowg))
aj = jax.device_put(jnp.asarray(avail))
rj = jax.device_put(jnp.asarray(resid))

variants = sys.argv[1:] or ["full", "nosub", "nodot", "noscat", "noasm"]
for v in variants:
    if v.startswith("chroma"):
        # 4K 4:2:0 chroma-pair load: 8x8 TUs, two planes per step
        log2c, nch = 3, 8
        BHc, Cc, RWc = 32, 15, 256
        recsc = []
        for band in range(NB):
            for yy in range(band * BHc, min((band + 1) * BHc, H // 2),
                            nch):
                for xx in range(0, W // 2, nch):
                    recsc.append((xx, yy % BHc, band))
        scalc = np.zeros(NB * K, np.int32)
        cntc = np.zeros(NB, np.int64)
        modc = rng.randint(0, 35, len(recsc))
        for i2, (xx, yin, band) in enumerate(recsc):
            s2 = band * K + cntc[band]
            cntc[band] += 1
            scalc[s2] = pack_rec(xx, yin, 0, int(modc[i2]), 1,
                                 int(ft[modc[i2]]))
        planec = rng.randint(0, 256, (NB * BHc, Cc, 128)).astype(np.int32)
        scan = build_scan((log2c,), BHc, Cc, NB, K, 2, 8, False, False,
                          RWc)
        f = jax.jit(lambda s, sp, g, a, r, p, q: scan(s, sp, [g, g], a, [r, r], [p, q]))
        sjc = jax.device_put(jnp.asarray(scalc))
        pj = jax.device_put(jnp.asarray(planec))
        qj = jax.device_put(jnp.asarray(planec))
        t0 = time.time()
        pj, qj = f(sjc, spj, gj, aj, rj, pj, qj)
        float(pj[0, 0, 0])
        tc = time.time() - t0
        t0 = time.time()
        R = 10
        for _ in range(R):
            pj, qj = f(sjc, spj, gj, aj, rj, pj, qj)
        float(pj[0, 0, 0])
        dt = (time.time() - t0) / R
        print(f"{v:8s}: {dt*1e3:7.1f} ms  "
              f"({dt/len(recsc)*1e9:5.0f} ns/pair) [compile {tc:.0f}s]",
              flush=True)
        continue
    abl = frozenset() if v == "full" else frozenset(v.split("+"))
    scan = build_scan((log2,), BH, C, NB, K, 1, 8, False, True, RW,
                      ablate=abl)
    f = jax.jit(lambda s, sp, g, a, r, p: scan(s, sp, [g], a, [r], [p]))
    pj = jax.device_put(jnp.asarray(plane))
    t0 = time.time()
    pj = f(sj, spj, gj, aj, rj, pj)   # plane donated: chain output->input
    float(pj[0, 0, 0])
    tc = time.time() - t0
    t0 = time.time()
    R = 10
    for _ in range(R):
        pj = f(sj, spj, gj, aj, rj, pj)
    float(pj[0, 0, 0])
    dt = (time.time() - t0) / R
    print(f"{v:8s}: {dt*1e3:7.1f} ms  ({dt/len(recs)*1e9:5.0f} ns/TU) "
          f"[compile {tc:.0f}s]", flush=True)
