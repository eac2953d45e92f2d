"""Pallas (Mosaic TPU) kernel: the MC interpolation tap filters.

The XLA form of the two shifted-tap passes over the gathered tile rows
(ops/mc_tile_jax.py _luma_pred_tile/_chroma_pred_tile) costs ~9 ms/frame
at 4K for luma alone — an order of magnitude off both the HBM floor
(~0.3 ms for the 133 MB of row traffic) and the VPU MAC floor, because
XLA materialises every intermediate at int32 width and relayouts the
uint8 rows. This kernel runs both passes in VMEM per block-batch:

    h-pass: tmp[j*T + r] = sum_u win[(u+j)*T + r] * th[u]   (f32 FMA)
    v-pass: out[j*T + i] = sum_u tmp[j*T + (i+u)] * tv[u]

f32 math is bit-exact here: samples <= 1023 and taps <= 58 are exactly
representable, every product < 2^17 and every accumulation < 2^22 stays
inside f32's 24-bit mantissa (HEVC 8.5.3.3.3 bounds: h <= 255*112, v <=
28560*112 for 8-bit; 10-bit analogues < 2^24 as well). The two in-spec
arithmetic shifts (>> shift1 between passes, >> 6 after) run in int32,
preserving floor semantics for negatives.

Reference kernels: qpel/epel SSE paths acceleration.h:29-201,
motion.cc:49-278. Layout contract with mc_tile_jax: row element c*T + r.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512                  # block rows per grid step (multiple of 32)


def _kernel(win_ref, taps_ref, out_ref, *, T, U, TMP, OUT, shift1):
    """win: (B, T*T) sample rows; taps: (B, 32) int8 — th in lanes
    [0, U), tv in lanes [16, 16+U); out: (B, OUT) int32."""
    # Mosaic has no direct uint8/int8 -> f32 cast: hop through int32
    w = win_ref[:].astype(jnp.int32).astype(jnp.float32)    # (B, T*T)
    taps = taps_ref[:].astype(jnp.int32).astype(jnp.float32)  # (B, 32)
    # horizontal: lane j*T+r of tmp = sum_u win[(u+j)*T + r] * th[u]
    tmp = taps[:, 0:1] * w[:, :TMP]
    for u in range(1, U):
        tmp = tmp + taps[:, u:u + 1] * w[:, T * u:T * u + TMP]
    if shift1:
        tmp = (tmp.astype(jnp.int32) >> shift1).astype(jnp.float32)
    if TMP < OUT + U - 1 + 1:      # chroma: pad so every v slice is static
        tmp = jnp.concatenate(
            [tmp, jnp.zeros((tmp.shape[0], OUT + U - TMP), jnp.float32)],
            axis=1)
    # vertical: lane j*T+i of out = sum_u tmp[j*T + (i+u)] * tv[u]
    acc = taps[:, 16:17] * tmp[:, :OUT]
    for u in range(1, U):
        acc = acc + taps[:, 16 + u:17 + u] * tmp[:, u:u + OUT]
    out_ref[:] = acc.astype(jnp.int32) >> 6


@functools.partial(jax.jit,
                   static_argnames=("T", "U", "TMP", "OUT", "shift1",
                                    "interpret"))
def mc_taps_pallas(win, taps, T, U, TMP, OUT, shift1, interpret=False):
    """win: (N, T*T) uint8/int16 gathered tile rows (N multiple of BLK —
    callers pad via the gather index vector, not a data copy).
    taps: (N, 32) int8, th lanes [0,U) / tv lanes [16,16+U).
    Returns (N, OUT) int32 14-bit predictions (luma: T=16,U=11,TMP=80,
    OUT=64 lanes j*16+i; chroma: T=8,U=7,TMP=16,OUT=16 lanes j*8+i)."""
    N = win.shape[0]
    assert N % BLK == 0, (N, BLK)
    return pl.pallas_call(
        functools.partial(_kernel, T=T, U=U, TMP=TMP, OUT=OUT,
                          shift1=shift1),
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, T * T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 32), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, OUT), jnp.int32),
        interpret=interpret,
    )(win, taps)
