#!/usr/bin/env python3
"""Probe Mosaic primitives needed by the planned VMEM-resident intra
wavefront kernel (ops/pallas/intra_scan.py). Each probe is a tiny
pallas_call checked against numpy. Run on the real TPU:
    python tools/probe_intra_kernel.py [probe ...]
"""
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, ok, note=""):
    print(f"{'OK  ' if ok else 'FAIL'} {name} {note}", flush=True)


def p1_dyn_lane_roll():
    """pltpu.roll with a TRACED shift on the lane axis."""
    def kern(s_ref, x_ref, o_ref):
        sh = s_ref[0]
        o_ref[:] = pltpu.roll(x_ref[:], -sh, axis=1)

    x = np.arange(8 * 256, dtype=np.int32).reshape(8, 256)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32))
    y = f(jnp.asarray([37], jnp.int32), x)
    report("P1 dyn lane roll", np.array_equal(np.asarray(y), np.roll(x, -37, 1)))


def p2_dyn_sublane_roll():
    def kern(s_ref, x_ref, o_ref):
        sh = s_ref[0]
        o_ref[:] = pltpu.roll(x_ref[:], -sh, axis=0)

    x = np.arange(64 * 128, dtype=np.int32).reshape(64, 128)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32))
    y = f(jnp.asarray([11], jnp.int32), x)
    report("P2 dyn sublane roll", np.array_equal(np.asarray(y), np.roll(x, -11, 0)))


def p4_dyn_sublane_load():
    """ref[pl.ds(traced, 32), :] with UNALIGNED traced start."""
    def kern(s_ref, x_ref, o_ref):
        t = s_ref[0]
        o_ref[:] = x_ref[pl.ds(t, 32), :]

    x = np.arange(128 * 128, dtype=np.int32).reshape(128, 128)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32))
    y = f(jnp.asarray([13], jnp.int32), x)
    report("P4 dyn sublane load (unaligned)", np.array_equal(np.asarray(y), x[13:45]))


def p5_dyn_middim():
    """3D ref: traced scalar on dim0 + traced pl.ds on middle dim."""
    def kern(s_ref, x_ref, o_ref):
        r = s_ref[0]
        b = s_ref[1]
        o_ref[:] = x_ref[r, pl.ds(b, 2), :]

    x = np.arange(16 * 8 * 128, dtype=np.int32).reshape(16, 8, 128)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((2, 128), jnp.int32))
    y = f(jnp.asarray([5, 3], jnp.int32), x)
    report("P5 dyn mid-dim 3D load", np.array_equal(np.asarray(y), x[5, 3:5]))


def p6_uint8_rmw():
    """uint8 scratch: dyn-offset load, int32 math, aligned store back."""
    def kern(s_ref, x_ref, o_ref, scr):
        t = s_ref[0]            # multiple of 8
        scr[:] = x_ref[:]
        w = scr[pl.ds(t, 32), :].astype(jnp.int32)
        w = jnp.clip(w + 7, 0, 255)
        scr[pl.ds(t, 32), :] = w.astype(jnp.uint8)
        o_ref[:] = scr[:]

    x = (np.arange(128 * 128) % 251).astype(np.uint8).reshape(128, 128)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.uint8)]),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.uint8))
    y = f(jnp.asarray([16], jnp.int32), x)
    ref = x.copy()
    ref[16:48] = np.clip(ref[16:48].astype(np.int32) + 7, 0, 255).astype(np.uint8)
    report("P6 uint8 scratch RMW (aligned store)", np.array_equal(np.asarray(y), ref))


def p6b_uint8_rmw_unaligned():
    def kern(s_ref, x_ref, o_ref, scr):
        t = s_ref[0]            # NOT aligned
        scr[:] = x_ref[:]
        w = scr[pl.ds(t, 32), :].astype(jnp.int32)
        w = jnp.clip(w + 7, 0, 255)
        scr[pl.ds(t, 32), :] = w.astype(jnp.uint8)
        o_ref[:] = scr[:]

    x = (np.arange(128 * 128) % 251).astype(np.uint8).reshape(128, 128)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.uint8)]),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.uint8))
    y = f(jnp.asarray([13], jnp.int32), x)
    ref = x.copy()
    ref[13:45] = np.clip(ref[13:45].astype(np.int32) + 7, 0, 255).astype(np.uint8)
    report("P6b uint8 RMW (UNALIGNED store)", np.array_equal(np.asarray(y), ref))


def p7_col_to_row():
    """(128,1) -> (1,128) relayout via reshape/transpose."""
    def kern(x_ref, o_ref):
        c = x_ref[:, :1]                      # (128,1)
        o_ref[:] = c.reshape(1, 128)

    x = np.arange(128 * 128, dtype=np.int32).reshape(128, 128)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32))
    y = f(x)
    report("P7 (128,1)->(1,128) reshape", np.array_equal(np.asarray(y)[0], x[:, 0]))


def p9_smem_blockspec():
    """Per-grid-step scalar row via SMEM BlockSpec."""
    def kern(m_ref, x_ref, o_ref):
        i = pl.program_id(0)
        v = m_ref[0, 0]
        o_ref[:] = x_ref[:] + v

    M = np.arange(10, dtype=np.int32).reshape(10, 1) * 100
    x = np.ones((10, 8, 128), np.int32)
    f = pl.pallas_call(
        kern,
        grid=(10,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, 8, 128), jnp.int32))
    y = f(M, x)
    want = 1 + M[:, :, None]
    report("P9 SMEM per-step scalar blockspec",
           np.array_equal(np.asarray(y), np.broadcast_to(want, (10, 8, 128))))


def p10_switch():
    """lax.switch on a scalar, branches touch scratch."""
    def kern(s_ref, x_ref, o_ref, scr):
        scr[:] = x_ref[:]

        def b0():
            o_ref[:] = scr[:] * 2

        def b1():
            o_ref[:] = scr[:] + 100

        def b2():
            o_ref[:] = scr[:] - 1

        jax.lax.switch(s_ref[0], [b0, b1, b2])

    x = np.arange(8 * 128, dtype=np.int32).reshape(8, 128)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))
    y = f(jnp.asarray([1], jnp.int32), x)
    report("P10 lax.switch w/ scratch", np.array_equal(np.asarray(y), x + 100))


def p11_dma_alias():
    """HBM(ANY) input planes, scratch work, write-back via DMA, aliased."""
    def kern(s_ref, x_hbm, o_hbm, scr, sem):
        t = s_ref[0]
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(t, 64)], scr, sem)
        cp.start()
        cp.wait()
        scr[:] = scr[:] + 5
        cp2 = pltpu.make_async_copy(scr, o_hbm.at[pl.ds(t, 64)], sem)
        cp2.start()
        cp2.wait()

    x = np.arange(256 * 128, dtype=np.int32).reshape(256, 128)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((64, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        input_output_aliases={1: 0})
    y = f(jnp.asarray([64], jnp.int32), x)
    ref = x.copy()
    ref[64:128] += 5
    report("P11 ANY->scratch DMA + alias", np.array_equal(np.asarray(y), ref))


def p13_ffill_rolls():
    """forward-fill via masked log-rolls on (1,256)."""
    def kern(x_ref, m_ref, o_ref):
        v = x_ref[:]
        have = m_ref[:] != 0
        for s in (1, 2, 4, 8, 16, 32, 64, 128):
            vr = pltpu.roll(v, s, axis=1)
            hr = pltpu.roll(have.astype(jnp.int32), s, axis=1) != 0
            v = jnp.where(have, v, vr)
            have = have | hr
        o_ref[:] = v

    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (1, 256)).astype(np.int32)
    m = (rng.rand(1, 256) < 0.3).astype(np.int32)
    m[0, 0] = 1
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 256), jnp.int32))
    y = np.asarray(f(x, m))
    ref = x[0].copy()
    last = ref[0]
    for i in range(256):
        if m[0, i]:
            last = ref[i]
        else:
            ref[i] = last
    report("P13 ffill via masked rolls", np.array_equal(y[0], ref))


def p12_grid_overhead():
    """Per-grid-step overhead: ~empty kernel, grid=(N,)."""
    N = 100_000

    def kern(x_ref, o_ref, scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            scr[:] = x_ref[:]
        scr[0, 0] = scr[0, 0] + 1

        @pl.when(i == N - 1)
        def _():
            o_ref[:] = scr[:]

    x = np.ones((8, 128), np.int32)
    f = pl.pallas_call(
        kern, grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)])
    jf = jax.jit(f)
    y = jf(x)
    np.asarray(y)
    t0 = time.time()
    y = jf(x)
    np.asarray(y)
    dt = time.time() - t0
    report("P12 grid overhead", True,
           f"{dt / N * 1e9:.0f} ns/step (N={N}, total {dt*1e3:.1f} ms)")


PROBES = {k[3:] if k[2] == '_' else k[1:]: v for k, v in list(globals().items())
          if k.startswith("p") and callable(v)}


def main():
    names = sys.argv[1:]
    sel = {k: v for k, v in sorted(PROBES.items())
           if not names or any(k.startswith(n) for n in names)}
    print(f"backend: {jax.default_backend()}", flush=True)
    for k, fn in sel.items():
        try:
            fn()
        except Exception as e:
            report(k, False, f"EXC: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
