"""Pallas (Mosaic TPU) kernel: build the MC overlap-tile table.

The tile table (ops/mc_tile_jax.py) is a 16x data expansion of each padded
reference plane into stride-4 overlapping tiles — a pure data shuffle
whose XLA form costs ~50 ms/frame at 4K (35x off the HBM floor) in the
column-interleave + transpose stages. The kernel DMAs the T plane rows of
each band DIRECTLY from the padded plane (leading-dim dynamic slices —
no XLA staging copy of the 4x-overlapping bands), transposes a whole
B-band group at once so the vector ops run on (., B*T)-lane shapes
(the band-at-a-time form spent ~6 ms/4K frame in 12%-lane-occupancy
rolls/stores), splits sublanes (ntx0, 4, B*T) — the lane-preserving
reshape direction Mosaic accepts — and emits each tile column c with a
sublane roll + static stores. Double-buffered DMA overlaps the next
group.

Layout contract (shared with the XLA builder, differentially tested in
tests/test_mc_tile.py): table row for tile (r, ty, tx) has element
[c*T + rr] = tile[row rr, col c], T = tile side (16 luma / 8 chroma).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hbm_ref, out_ref, scratch, sems, *, T, B, ngrp, ntx, ntx0,
            total, out_dtype):
    r = pl.program_id(0)
    t = pl.program_id(1)
    step = r * ngrp + t

    def dma(slot, b, rr, tt):
        # band b of group tt: T contiguous plane rows from 4*(tt*B + b)
        return pltpu.make_async_copy(
            hbm_ref.at[rr, pl.ds(4 * (tt * B + b), T)],
            scratch.at[slot, b],
            sems.at[slot, b],
        )

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        for b in range(B):
            dma(0, b, r, t).start()

    @pl.when(step + 1 < total)
    def _():
        nstep = step + 1
        nr = nstep // ngrp
        nt = jax.lax.rem(nstep, ngrp)
        for b in range(B):
            dma(1 - slot, b, nr, nt).start()

    for b in range(B):
        dma(slot, b, r, t).wait()
    # ONE transpose for the whole B-band group: vector ops then run on
    # (., B*T)-lane shapes instead of (., T)
    big = scratch[slot].reshape(B * T, scratch.shape[-1])  # [(b,rr), x]
    bt = big.astype(jnp.int32).T               # (Wp_p, B*T): [x, (b,rr)]
    r3 = bt.reshape(ntx0, 4, B * T)            # [x0, dx, (b,rr)]
    for c in range(T):
        q = r3[:, c % 4, :]                    # (ntx0, B*T)
        if c // 4:
            # sublane roll == shift by -(c//4)
            q = pltpu.roll(q, ntx0 - c // 4, axis=0)
        qo = q[:ntx].astype(out_dtype)
        for b in range(B):
            out_ref[0, 0, b, :, c * T:(c + 1) * T] = \
                qo[:, b * T:(b + 1) * T]


@functools.partial(jax.jit,
                   static_argnames=("T", "out_dtype", "interpret"))
def build_tile_table_pallas(padded, T, out_dtype=jnp.int16,
                            interpret=False):
    """padded: (R, Hp, Wp) int16 edge-padded plane stack.
    T: tile side (16 luma, 8 chroma). Returns (R*nty*ntx, T*T) of
    out_dtype (uint8 for 8-bit samples — halves the table write)."""
    R, Hp, Wp = padded.shape
    nty = (Hp - T + 4) // 4
    ntx = (Wp - T + 4) // 4
    Wp_p = -(-Wp // 128) * 128                  # DMA wants 128-mult lanes
    ntx0 = Wp_p // 4
    B = 8 if nty % 8 == 0 else next(
        b for b in (7, 6, 5, 4, 3, 2, 1) if nty % b == 0)
    ngrp = nty // B
    padded = jnp.pad(padded, ((0, 0), (0, 0), (0, Wp_p - Wp)))
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, B=B, ngrp=ngrp, ntx=ntx, ntx0=ntx0,
                          total=R * ngrp, out_dtype=out_dtype),
        grid=(R, ngrp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1, B, ntx, T * T),
                               lambda r, t: (r, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, ngrp, B, ntx, T * T), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, B, T, Wp_p), jnp.int16),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
        interpret=interpret,
    )(padded)
    return out.reshape(R * nty * ntx, T * T)
