"""Pallas (Mosaic TPU) kernel: build the MC overlap-tile table.

The tile table (ops/mc_tile_jax.py) is a 16x data expansion of each padded
reference plane into stride-4 overlapping tiles — a pure data shuffle
whose XLA form costs ~50 ms/frame at 4K (35x off the HBM floor) in the
column-interleave + transpose stages. Division of labour here:

  XLA (cheap, row-granular):  bands[r, ty, rr, x] = P[r, 4*ty+rr, x]
  Mosaic (this kernel):       per band, the lane->sublane interleave
                              emitting tiles [tx, c*T + rr]

The kernel DMAs one whole band per grid step (leading-dim slicing only —
Mosaic rejects lane/sublane-offset DMA slices), transposes in int32
(rotate/transpose are 32-bit-only), splits sublanes (ntx0, 4, T) — the
lane-preserving reshape direction Mosaic accepts — and emits each tile
column c with a sublane roll + static store. Double-buffered DMA
overlaps the next band.

Layout contract (shared with the XLA builder, differentially tested):
table row for tile (r, ty, tx) has element [c*T + rr] = tile[row rr,
col c], T = tile side (16 luma / 8 chroma).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hbm_ref, out_ref, scratch, sems, *, T, nty, ntx, ntx0, total,
            out_dtype):
    r = pl.program_id(0)
    t = pl.program_id(1)
    step = r * nty + t

    def dma(slot, rr, tt):
        return pltpu.make_async_copy(
            hbm_ref.at[rr, tt],
            scratch.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        dma(0, r, t).start()

    @pl.when(step + 1 < total)
    def _():
        nstep = step + 1
        nr = nstep // nty
        nt = jax.lax.rem(nstep, nty)
        dma(1 - slot, nr, nt).start()

    dma(slot, r, t).wait()
    band = scratch[slot]                       # (T, Wp_p) i16: [rr, x]
    bt = band.astype(jnp.int32).T              # (Wp_p, T)    : [x, rr]
    r3 = bt.reshape(ntx0, 4, T)                # [x0, dx, rr] (ntx0 padded)
    for c in range(T):
        q = r3[:, c % 4, :]                    # (ntx0, T)
        if c // 4:
            # sublane roll == shift by -(c//4)
            q = pltpu.roll(q, ntx0 - c // 4, axis=0)
        out_ref[0, 0, :, c * T:(c + 1) * T] = q[:ntx].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("T", "out_dtype"))
def build_tile_table_pallas(padded, T, out_dtype=jnp.int16):
    """padded: (R, Hp, Wp) int16 edge-padded plane stack.
    T: tile side (16 luma, 8 chroma). Returns (R*nty*ntx, T*T) of
    out_dtype (uint8 for 8-bit samples — halves the table write)."""
    R, Hp, Wp = padded.shape
    nty = (Hp - T + 4) // 4
    ntx = (Wp - T + 4) // 4
    Wp_p = -(-Wp // 128) * 128                  # DMA wants 128-mult lanes
    ntx0 = Wp_p // 4
    padded = jnp.pad(padded, ((0, 0), (0, 0), (0, Wp_p - Wp)))
    bands = jnp.concatenate(
        [padded[:, 4 * s:4 * s + 4 * nty, :].reshape(R, nty, 4, Wp_p)
         for s in range(T // 4)], axis=2)       # (R, nty, T, Wp_p)
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, nty=nty, ntx=ntx, ntx0=ntx0,
                          total=R * nty, out_dtype=out_dtype),
        grid=(R, nty),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1, ntx, T * T),
                               lambda r, t: (r, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, nty, ntx, T * T), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, T, Wp_p), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(bands)
    return out.reshape(R * nty * ntx, T * T)
