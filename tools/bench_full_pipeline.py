#!/usr/bin/env python3
"""Benchmark (full pipeline variant): MC+residual+deblock+SAO at 4K in one
program. NOTE: on the current axon tunnel this program compiles but the
worker crashed during execution (kernel fault) — kept as a tool pending
round-2 stabilization; the driver bench (bench.py) uses the proven
residual+filter pipeline.

Measures the real decode compute path — dense per-4x4-block motion
compensation (all qpel/epel phases, bi-pred combine), batched dequant +
inverse DCT for a realistic 4K TU mix, residual row-scatter, the real
deblocking passes (V+H, spec 8.7.2 math) and SAO (band+edge, spec 8.7.3)
on all three planes — in frames/second on one chip, against the
reference's published 4K software decode rate (36 fps,
/root/reference/README.md:40 — see BASELINE.md).

The whole measurement is ONE compiled program (an internal fori_loop over
frames, each frame motion-compensating FROM the previous frame so
iterations are serially dependent) returning a checksum that forces
execution: per-call dispatch and (slow tunneled) compile time are
excluded, device time is included.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
    except Exception:
        pass
    import jax.numpy as jnp
    from libde265_tpu.ops.transform_jax import residual_batch
    from libde265_tpu.ops.inter_dense_jax import mc_dense
    from libde265_tpu.ops.deblock_jax import (deblock_luma_pass,
                                              deblock_chroma_pass)
    from libde265_tpu.ops.sao_jax import sao_apply

    H, W = 2176, 3840          # 4K padded to CTB
    ITERS = 20
    rng = np.random.RandomState(0)

    # ---- motion field: one MV per 4x4 block, mixed fractional phases ----
    N = (H // 4) * (W // 4)
    mv = jnp.asarray(rng.randint(-128, 128, (N, 2, 2)).astype(np.int32))
    slot = jnp.asarray(rng.randint(0, 2, (N, 2)).astype(np.int32))
    pf = jnp.asarray(np.stack([np.ones(N, np.int32),
                               (rng.rand(N) < 0.3).astype(np.int32)], 1))
    wts = jnp.asarray(np.zeros((N, 3, 5), np.int32))
    ex = jnp.asarray(np.zeros(N, bool))

    # ---- residual TU mix (per size class) ----
    classes = [(2, 40000), (3, 16000), (4, 5000), (5, 800)]
    flat = []
    for log2, n_tu in classes:
        n = 1 << log2
        flat += [jnp.asarray(rng.randint(-128, 128, (n_tu, n, n)).astype(np.int32)),
                 jnp.asarray(np.full((n_tu,), 32, np.int32)),
                 jnp.asarray((rng.randint(0, W // n, (n_tu,)) * n).astype(np.int32)),
                 jnp.asarray((rng.randint(0, H // n, (n_tu,)) * n).astype(np.int32))]

    # ---- deblock metadata (dense segment grids, real spec math) ----
    def dbmeta(n_s, n_e):
        return (jnp.asarray(rng.randint(0, 3, (n_s, n_e)).astype(np.int32)),
                jnp.asarray(np.full((n_s, n_e), 32, np.int32)),
                jnp.asarray(np.zeros((n_s, n_e), np.int32)),
                jnp.asarray(np.zeros((n_s, n_e), np.int32)),
                jnp.asarray(np.zeros((n_s, n_e), bool)),
                jnp.asarray(np.zeros((n_s, n_e), bool)))
    lm_v = dbmeta(H // 4, W // 8 - 1)
    lm_h = dbmeta(W // 4, H // 8 - 1)

    def cbmeta(n_s, n_e):
        return (jnp.asarray(rng.randint(0, 2, (2, n_s, n_e)).astype(np.int32)),
                jnp.asarray(np.full((2, n_s, n_e), 4, np.int32)),
                jnp.asarray(np.zeros((n_s, n_e), bool)),
                jnp.asarray(np.zeros((n_s, n_e), bool)))
    cm_v = cbmeta(H // 8, W // 16 - 1)
    cm_h = cbmeta(W // 8, H // 16 - 1)

    # ---- SAO maps (band + all 4 edge classes active) ----
    def sao_maps(h, w):
        return (jnp.asarray(rng.randint(0, 3, (h, w)).astype(np.int32)),
                jnp.asarray(rng.randint(0, 4, (h, w)).astype(np.int32)),
                jnp.asarray(rng.randint(0, 32, (h, w)).astype(np.int32)),
                jnp.asarray(rng.randint(-2, 3, (4, h, w)).astype(np.int32)),
                jnp.asarray(np.zeros((h, w), bool)),
                jnp.asarray(np.ones((4, h, w), bool)))
    sao_y = sao_maps(H, W)
    sao_c = sao_maps(H // 2, W // 2)

    Y0 = jnp.asarray(rng.randint(0, 255, (H, W)).astype(np.int32))
    C0 = jnp.asarray(rng.randint(0, 255, (H // 2, W // 2)).astype(np.int32))

    def frame_step(Y, Cb, Cr, Yp, Cbp, Crp, flat_args, meta):
        (mv, slot, pf, wts, ex, lm_v, lm_h, cm_v, cm_h, sao_y, sao_c) = meta
        # 1) dense MC from the previous two frames (serial dependency)
        refs_y = jnp.stack([Y, Yp])
        refs_cb = jnp.stack([Cb, Cbp])
        refs_cr = jnp.stack([Cr, Crp])
        Ymc, Cbmc, Crmc = mc_dense(refs_y, refs_cb, refs_cr,
                                   mv, slot, pf, wts, ex, 8)
        # 2) residuals: per size class, row-scatter into slot tables
        it = iter(flat_args)
        acc = jnp.zeros((H, W), jnp.int32)
        for log2, _ in classes:
            n = 1 << log2
            coeffs, qp, xs, ys = next(it), next(it), next(it), next(it)
            res = residual_batch(coeffs, qp, log2, False, 8)   # (N,n,n)
            rows = res.reshape(res.shape[0], n * n)
            slots = (ys >> log2) * (W >> log2) + (xs >> log2)
            table = jnp.zeros(((H >> log2) * (W >> log2), n * n), jnp.int32)
            table = table.at[slots].set(rows, unique_indices=True)
            rp = table.reshape(H >> log2, W >> log2, n, n)
            rp = rp.transpose(0, 2, 1, 3).reshape(H, W)
            acc = acc + rp
        Yr = jnp.clip(Ymc + acc, 0, 255)
        # 3) real deblocking, V then H, luma + chroma
        Yd = deblock_luma_pass(Yr, *lm_v, vertical=True, bitdepth=8)
        Yd = deblock_luma_pass(Yd, *lm_h, vertical=False, bitdepth=8)
        act, tc, po, qo = cm_v
        Cbd = deblock_chroma_pass(Cbmc, act[0], tc[0], po, qo,
                                  vertical=True, bitdepth=8)
        Crd = deblock_chroma_pass(Crmc, act[1], tc[1], po, qo,
                                  vertical=True, bitdepth=8)
        act, tc, po, qo = cm_h
        Cbd = deblock_chroma_pass(Cbd, act[0], tc[0], po, qo,
                                  vertical=False, bitdepth=8)
        Crd = deblock_chroma_pass(Crd, act[1], tc[1], po, qo,
                                  vertical=False, bitdepth=8)
        # 4) SAO on all three planes
        Ys = sao_apply(Yd, *sao_y, bitdepth=8)
        Cbs = sao_apply(Cbd, *sao_c, bitdepth=8)
        Crs = sao_apply(Crd, *sao_c, bitdepth=8)
        return Ys, Cbs, Crs

    @jax.jit
    def run(Y, C, meta, *flat_args):
        def body(i, carry):
            Yc, Cbc, Crc, Yp, Cbp, Crp = carry
            Ys, Cbs, Crs = frame_step(Yc, Cbc, Crc, Yp, Cbp, Crp,
                                      flat_args, meta)
            # perturb with the loop index so iterations can't be collapsed
            return (Ys + (i & 1), Cbs, Crs, Yc, Cbc, Crc)
        out = jax.lax.fori_loop(0, ITERS, body, (Y, C, C, Y, C, C))
        return (jnp.sum(out[0], dtype=jnp.int32) ^
                jnp.sum(out[1], dtype=jnp.int32))

    # metadata passed as arguments, not closure constants: keeps the HLO
    # small (the axon remote-compile RPC rejects oversized request bodies)
    meta = (mv, slot, pf, wts, ex, lm_v, lm_h, cm_v, cm_h, sao_y, sao_c)
    # warmup/compile
    chk = int(run(Y0, C0, meta, *flat))
    # timed run
    t0 = time.time()
    chk = int(run(Y0, C0, meta, *flat))
    dt = (time.time() - t0) / ITERS
    fps = 1.0 / dt
    baseline = 36.0
    print(json.dumps({
        "metric": "tpu_4k_decode_pipeline_fps",
        "value": round(fps, 2),
        "unit": "frames/s (device MC+residual+deblock+SAO pipeline, 4K)",
        "vs_baseline": round(fps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
