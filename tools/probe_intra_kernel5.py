#!/usr/bin/env python3
"""Probe batch 5: block-scatter rework primitives — (1,k*128)->(k,128)
reshape, multi-row traced-offset RMW, strip roll."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, ok, note=""):
    print(f"{'OK  ' if ok else 'FAIL'} {name} {note}", flush=True)


def p50_row_to_rows(k):
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[0:1, :].reshape(k, 128)

    x = np.arange(k * 128, dtype=np.int32).reshape(1, k * 128)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, 128), jnp.int32))
    y = np.asarray(f(x))
    report(f"P50 (1,{k*128})->({k},128)",
           np.array_equal(y, x.reshape(k, 128)))


def p51_multirow_rmw():
    """band[pl.ds(yin, 16), cx, :] RMW with traced yin + strip roll."""
    H, C = 64, 4

    def kern(s_ref, x_ref, b_ref, o_ref, tmp):
        yin, ox, cx = s_ref[0], s_ref[1], s_ref[2]
        blk = b_ref[:]                       # (16,128)
        tmp[0:16, 0:128] = blk
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        rolled = pltpu.roll(tmp[0:16, :], ox, axis=1)
        m = (lane >= ox) & (lane < ox + 16)
        w0 = x_ref[pl.ds(yin, 16), cx, :]
        x_ref[pl.ds(yin, 16), cx, :] = \
            jnp.where(m[:, :128], rolled[:, :128], w0)
        cx1 = jnp.minimum(cx + 1, C - 1)
        w1 = x_ref[pl.ds(yin, 16), cx1, :]
        x_ref[pl.ds(yin, 16), cx1, :] = \
            jnp.where(m[:, 128:], rolled[:, 128:], w1)
        o_ref[:] = x_ref[:]

    rng = np.random.RandomState(1)
    x = rng.randint(0, 255, (H, C, 128)).astype(np.int32)
    blk = rng.randint(1000, 2000, (16, 128)).astype(np.int32)
    yin, ox, cx = 13, 117, 1
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((16, 256), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((H, C, 128), jnp.int32))
    y = np.asarray(f(jnp.asarray([yin, ox, cx], jnp.int32), x, blk))
    want = x.reshape(H, C * 128).copy()
    want[yin:yin + 16, cx * 128 + ox:cx * 128 + ox + 16] = blk[:, :16]
    report("P51 multirow RMW + strip roll",
           np.array_equal(y.reshape(H, C * 128), want))


def p52_place_dot():
    """Placement dot: out (1,256) int8-centered x P (256, 16*128) ->
    reshape (16,128); exactness incl. bias."""
    n = 16
    P = np.zeros((n * n, n * 128), np.int8)
    for r in range(n):
        for c in range(n):
            P[r * n + c, r * 128 + c] = 1
    mask = P.astype(np.int32).sum(0)[None]   # placed-lane indicator

    def kern(x_ref, p_ref, m_ref, o_ref):
        x8 = (x_ref[0:1, :] - 128).astype(jnp.int8)
        d = jax.lax.dot_general(x8, p_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[:] = (d + 128 * m_ref[:]).reshape(n, 128)

    rng = np.random.RandomState(2)
    x = rng.randint(0, 256, (1, 256)).astype(np.int32)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.int32))
    y = np.asarray(f(x, P, mask))
    want = np.zeros((n, 128), np.int64)
    want[:, :n] = x.reshape(n, n)
    report("P52 placement dot + reshape", np.array_equal(y, want))


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    for k in (2, 8, 16, 32):
        try:
            p50_row_to_rows(k)
        except Exception as e:
            report(f"P50 k={k}", False, f"EXC {str(e)[:150]}")
    for fn in (p51_multirow_rmw, p52_place_dot):
        try:
            fn()
        except Exception as e:
            report(fn.__name__, False, f"EXC {type(e).__name__}: {str(e)[:200]}")
