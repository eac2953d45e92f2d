#!/usr/bin/env python3
"""Probe batch 2 for the intra wavefront kernel design (see
probe_intra_kernel.py). Run on the real TPU."""
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


def p20_i32_rmw_unaligned():
    """int32 scratch: unaligned dynamic sublane load+store (RMW)."""
    def kern(s_ref, x_ref, o_ref, scr):
        t = s_ref[0]
        scr[:] = x_ref[:]
        w = scr[pl.ds(t, 16), :]
        scr[pl.ds(t, 16), :] = w + 7
        o_ref[:] = scr[:]

    x = np.arange(128 * 128, dtype=np.int32).reshape(128, 128)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32))
    y = f(jnp.asarray([13], jnp.int32), x)
    ref = x.copy()
    ref[13:29] += 7
    report("P20 int32 RMW unaligned dyn store", np.array_equal(np.asarray(y), ref))


def p20b_i32_rmw_3d():
    """int32 3D scratch RMW: [pl.ds(t,16), pl.ds(b,2), :]."""
    def kern(s_ref, x_ref, o_ref, scr):
        t, b = s_ref[0], s_ref[1]
        scr[:] = x_ref[:]
        w = scr[pl.ds(t, 16), pl.ds(b, 2), :]
        scr[pl.ds(t, 16), pl.ds(b, 2), :] = w + 7
        o_ref[:] = scr[:]

    x = np.arange(64 * 4 * 128, dtype=np.int32).reshape(64, 4, 128)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((64, 4, 128), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((64, 4, 128), jnp.int32))
    y = f(jnp.asarray([13, 1], jnp.int32), x)
    ref = x.copy()
    ref[13:29, 1:3] += 7
    report("P20b int32 3D RMW dyn", np.array_equal(np.asarray(y), ref))


def p22_reshape_row_to_tile():
    """(1,256) -> (16,16) lane->sublane reshape."""
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(16, 16)

    x = np.arange(256, dtype=np.int32).reshape(1, 256)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 16), jnp.int32))
    y = f(x)
    report("P22 (1,256)->(16,16) reshape", np.array_equal(np.asarray(y), x.reshape(16, 16)))


def p24_smem_row_scalars():
    """Scalars via SMEM blockspec (8,8) block, dynamic row read."""
    def kern(m_ref, x_ref, o_ref):
        i = pl.program_id(0)
        v = m_ref[i % 8, 0]
        o_ref[:] = x_ref[:] + v

    N = 32
    M = np.zeros((N, 8), np.int32)
    M[:, 0] = np.arange(N) * 100
    x = np.ones((N, 8, 128), np.int32)
    f = pl.pallas_call(
        kern, grid=(N,),
        in_specs=[pl.BlockSpec((8, 8), lambda i: (i // 8, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8, 128), jnp.int32))
    y = f(M, x)
    want = 1 + M[:, :1, None] * np.ones((N, 8, 128), np.int32)
    report("P24 SMEM (8,8) block scalars", np.array_equal(np.asarray(y), want))


def p23_big_prefetch():
    """SMEM capacity: (262144,) int32 scalar-prefetch array (1 MB)."""
    def kern(s_ref, x_ref, o_ref):
        i = pl.program_id(0)
        o_ref[:] = x_ref[:] + s_ref[i * 1000]

    s = np.arange(262144, dtype=np.int32)
    x = np.ones((4, 8, 128), np.int32)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(4,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda s_, i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda s_, i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.int32))
    y = f(s, x)
    want = 1 + (np.arange(4) * 1000)[:, None, None] * np.ones((4, 8, 128), np.int32)
    report("P23 1MB scalar prefetch", np.array_equal(np.asarray(y), want))


def p25_grid_overhead():
    N = 200_000

    def kern(x_ref, o_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[0] = 0
        acc[0] = acc[0] + 1

        @pl.when(i == N - 1)
        def _():
            o_ref[:] = x_ref[:] + acc[0]

    x = np.ones((8, 128), np.int32)
    f = pl.pallas_call(
        kern, grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)])
    jf = jax.jit(f)
    y = jf(x)
    ok = int(np.asarray(y)[0, 0]) == 1 + N
    t0 = time.time()
    np.asarray(jf(x))
    dt = time.time() - t0
    report("P25 grid overhead", ok, f"{dt / N * 1e9:.0f} ns/step")


def p26_band_dma():
    """Band-switch DMA pattern: ANY plane in/out alias, scratch band,
    flush+load at 8-aligned traced offsets, plus compute between."""
    def kern(s_ref, x_hbm, o_hbm, band, sem):
        b0, b1 = s_ref[0], s_ref[1]
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(b0, 72)], band, sem)
        cp.start()
        cp.wait()
        band[8:72, :] = band[8:72, :] * 2
        cp2 = pltpu.make_async_copy(band.at[pl.ds(8, 64)],
                                    o_hbm.at[pl.ds(b0 + 8, 64)], sem)
        cp2.start()
        cp2.wait()
        cp3 = pltpu.make_async_copy(x_hbm.at[pl.ds(b1, 72)], band, sem)
        cp3.start()
        cp3.wait()
        band[8:72, :] = band[8:72, :] + 5
        cp4 = pltpu.make_async_copy(band.at[pl.ds(8, 64)],
                                    o_hbm.at[pl.ds(b1 + 8, 64)], sem)
        cp4.start()
        cp4.wait()

    x = np.arange(256 * 512, dtype=np.int32).reshape(256, 512)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((72, 512), jnp.int32),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((256, 512), jnp.int32),
        input_output_aliases={1: 0})
    y = f(jnp.asarray([0, 64], jnp.int32), x)
    ref = x.copy()
    ref[8:72] *= 2
    ref[72:136] = x[72:136] + 5
    report("P26 band flush/load DMA", np.array_equal(np.asarray(y), ref))


def p27_matvec_flat():
    """The planned flat matvec: refT (72,1) x W (72,256) int8 -> reduce."""
    def kern(r_ref, w_ref, o_ref):
        refT = r_ref[:]                           # (72,1) int32
        prod = refT * w_ref[:].astype(jnp.int32)  # (72,256)
        o_ref[:] = jnp.sum(prod, axis=0, keepdims=True)

    rng = np.random.RandomState(1)
    r = rng.randint(0, 255, (72, 1)).astype(np.int32)
    w = rng.randint(-32, 33, (72, 256)).astype(np.int8)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 256), jnp.int32))
    y = f(r, w)
    want = (r.astype(np.int64) * w.astype(np.int64)).sum(0)[None]
    report("P27 flat matvec int8 W", np.array_equal(np.asarray(y), want))


def p28_dyn_w_slice():
    """Dynamic sublane slice of a big VMEM W table by mode*Lp."""
    def kern(s_ref, w_ref, r_ref, o_ref):
        m = s_ref[0]
        W = w_ref[pl.ds(m * 72, 72), :].astype(jnp.int32)
        o_ref[:] = jnp.sum(r_ref[:] * W, axis=0, keepdims=True)

    rng = np.random.RandomState(2)
    w = rng.randint(-32, 33, (35 * 72, 256)).astype(np.int8)
    r = rng.randint(0, 255, (72, 1)).astype(np.int32)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 256), jnp.int32))
    y = f(jnp.asarray([7], jnp.int32), w, r)
    want = (r.astype(np.int64) * w[7 * 72:8 * 72].astype(np.int64)).sum(0)[None]
    report("P28 dyn W-table slice + matvec", np.array_equal(np.asarray(y), want))


PROBES = {k: v for k, v in list(globals().items())
          if k.startswith("p2") and callable(v)}


def main():
    names = sys.argv[1:]
    sel = {k: v for k, v in sorted(PROBES.items())
           if not names or any(n in k for n in names)}
    print(f"backend: {jax.default_backend()}", flush=True)
    for k, fn in sel.items():
        try:
            fn()
        except Exception as e:
            report(k, False, f"EXC: {type(e).__name__}: {str(e)[:250]}")


if __name__ == "__main__":
    main()
