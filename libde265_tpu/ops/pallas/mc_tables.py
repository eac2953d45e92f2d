"""Pallas (Mosaic TPU) kernel: build the MC overlap-tile table.

The tile table (ops/mc_tile_jax.py) is a 16x data expansion of each padded
reference plane into stride-4 overlapping tiles — a pure data shuffle that
XLA lowers to ~50 ms of strided concats/transposes at 4K, 35x off the HBM
floor. This kernel streams one 16-row (transposed) band per grid step
through VMEM with double-buffered manual DMA and emits the tiles with two
in-register reshuffles, touching HBM exactly once per byte in/out.

Layout contract (shared with the XLA builder, differentially tested):
table row for tile (r, ty, tx) has element [c*T + rr] = tile[row rr, col c]
where T is the tile side (16 luma / 8 chroma).

Input is the TRANSPOSED padded plane stack P_T (R, Wp, Hp): the caller does
one whole-plane XLA transpose (regular, fast); each band DMA then reads the
contiguous-ish slab P_T[r, :, 4ty:4ty+T] = (Wp, T).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hbm_ref, out_ref, scratch, sems, *, T, nty, ntx, ntx0, Wp,
            total):
    r = pl.program_id(0)
    t = pl.program_id(1)
    step = r * nty + t

    def dma(slot, rr, tt):
        return pltpu.make_async_copy(
            hbm_ref.at[rr, :, pl.ds(4 * tt, T)],
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
    slab = scratch[slot]                       # (Wp, T): [x, rr]
    q = slab.reshape(ntx0, 4 * T)              # [tx0, dxm*T + rr]
    out_ref[0, 0] = jnp.concatenate(
        [q[s:s + ntx, :] for s in range(T // 4)],
        axis=1)                                # [tx, (4s+dxm)*T + rr]


@functools.partial(jax.jit, static_argnames=("T",))
def build_tile_table_pallas(padded, T):
    """padded: (R, Hp, Wp) int16 edge-padded plane stack.
    T: tile side (16 luma, 8 chroma). Returns (R*nty*ntx, T*T) int16."""
    R, Hp, Wp = padded.shape
    nty = (Hp - T + 4) // 4
    ntx = (Wp - T + 4) // 4
    ntx0 = Wp // 4
    pt = padded.transpose(0, 2, 1)             # (R, Wp, Hp)
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, nty=nty, ntx=ntx, ntx0=ntx0,
                          Wp=Wp, total=R * nty),
        grid=(R, nty),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1, ntx, T * T),
                               lambda r, t: (r, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, nty, ntx, T * T), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((2, Wp, T), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(pt)
    return out.reshape(R * nty * ntx, T * T)
