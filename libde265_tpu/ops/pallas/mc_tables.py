"""Pallas (Mosaic TPU) kernel: build the MC overlap-tile table.

The tile table (ops/mc_tile_jax.py) is a 16x data expansion of each padded
reference plane into stride-4 overlapping tiles — a pure data shuffle
whose XLA form costs ~50 ms/frame at 4K (35x off the HBM floor) in the
column-interleave + transpose stages. The kernel DMAs each B-band group's
whole row SPAN (rows [32*t, 32*t + 4*(B-1) + T)) from the padded plane in
ONE aligned async copy — the group start 32*t is provably 8-divisible, a
Mosaic requirement for dynamic sublane-dim slices, and transferring the
span once instead of per-band T-row windows cuts DMA traffic ~2.7x (the
4x band overlap is re-materialized in-register with static sublane
slices). The whole group is transposed at once so the vector ops run on
(., B*T)-lane shapes, split (ntx0, 4, B*T) — the lane-preserving reshape
direction Mosaic accepts — and each tile column c is emitted with a
sublane roll + static stores. Double-buffered DMA overlaps the next
group.

Layout contract (shared with the XLA builder, differentially tested in
tests/test_mc_tile.py): table row for tile (r, ty, tx) has element
[c*T + rr] = tile[row rr, col c], T = tile side (16 luma / 8 chroma).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 8                       # bands per group (tile rows per grid step)

_PERM_CACHE = {}


def _emit_perm(T, P):
    """(2048, B*P*T*T) 0/1 int8: MXU permutation from the staged
    (k,m)-piece layout to the table-row layout. Staged lane
    (4k+m)*128 + j, where j = b*T+rr (luma) / p*64+b*8+rr (chroma,
    planes pre-concatenated in `big`); table lane b*(P*T*T) + p*T*T +
    (4k+m)*T + rr. Lets the emission store 8 full-width rows per group
    instead of 16*B masked T-lane slices (~8x vreg write
    amplification)."""
    key = (T, P)
    M = _PERM_CACHE.get(key)
    if M is None:
        W = B * P * T * T
        M = np.zeros((T * 128, W), np.int8)
        for i in range(T):
            k, m = i // 4, i % 4
            for j in range(128):
                if P == 1:
                    b, p, rr = j // T, 0, j % T
                else:
                    p, b, rr = j // 64, (j % 64) // T, j % T
                dst = b * (P * T * T) + p * T * T + (4 * k + m) * T + rr
                M[i * 128 + j, dst] = 1
        _PERM_CACHE[key] = M
    return M


def _kernel(hbm_ref, out_ref, scratch, sems, *, T, ngrp, ntx, ntx0,
            total, span_p, out_dtype):
    r = pl.program_id(0)
    t = pl.program_id(1)
    step = r * ngrp + t

    def dma(slot, rr, tt):
        # group tt: its bands' full row span, one aligned copy.
        # 4*B*tt = 32*tt is divisible by the (8,128) sublane tiling.
        start = pl.multiple_of(4 * B * tt, 8)
        return pltpu.make_async_copy(
            hbm_ref.at[rr, pl.ds(start, span_p)],
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
        nr = nstep // ngrp
        nt = jax.lax.rem(nstep, ngrp)
        dma(1 - slot, nr, nt).start()

    dma(slot, r, t).wait()
    span = scratch[slot]                       # (span_p, Wp_p)
    # re-materialize the 4x-overlapping bands in-register (static
    # sublane slices), then ONE transpose for the whole group: vector
    # ops run on (., B*T)-lane shapes instead of (., T)
    big = jnp.concatenate([span[4 * b:4 * b + T] for b in range(B)],
                          axis=0)              # [(b,rr), x]
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
    T: tile side (16 luma, 8 chroma). Returns (R*nty_p*ntx, T*T) of
    out_dtype (uint8 for 8-bit samples — halves the table write),
    nty_p = tile rows padded to the band-group size B (the canonical
    table layout, mc_tile_jax.ROWPAD == B): the kernel's output ships
    as-is — no post-kernel slice copy. Pad rows hold whatever the roll
    produced from the zero-padded plane; they are never gathered."""
    R, Hp, Wp = padded.shape
    nty = (Hp - T + 4) // 4
    ntx = (Wp - T + 4) // 4
    Wp_p = -(-Wp // 128) * 128                  # DMA wants 128-mult lanes
    ntx0 = Wp_p // 4
    nty_p = -(-nty // B) * B                    # pad tile rows to B=8
    # The nty..nty_p-1 pad rows hold roll residue (the XLA builder zeros
    # them). Safe because the MC gather clamps tile row ty to
    # (Hp-T)//4 == nty-1 (mc_tile_jax.py luma/chroma geometry: the MV
    # clip keeps y0 <= Hp-T), so pad rows are NEVER gathered. Any new
    # consumer of the table must preserve that clamp.
    ngrp = nty_p // B
    span = 4 * (B - 1) + T                      # group row span
    span_p = -(-span // 8) * 8                  # 8-aligned DMA length
    Hp_p = 4 * B * (ngrp - 1) + span_p          # rows the last DMA reads
    padded = jnp.pad(padded, ((0, 0), (0, max(0, Hp_p - Hp)),
                              (0, Wp_p - Wp)))
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, ngrp=ngrp, ntx=ntx, ntx0=ntx0,
                          total=R * ngrp, span_p=span_p,
                          out_dtype=out_dtype),
        grid=(R, ngrp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1, B, ntx, T * T),
                               lambda r, t: (r, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, ngrp, B, ntx, T * T), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, span_p, Wp_p), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(padded)
    return out.reshape(R * nty_p * ntx, T * T)


def _upd_kernel(slot_ref, hbm_ref, perm_ref, tin_ref, out_ref, scratch,
                xscr, sems, *, T, ngrp, ntx, ntx0, span_p, out_dtype, P):
    """In-place slot update: all P planes' tile rows for one band group,
    written directly into the persistent table block mapped by the
    scalar-prefetched slot (the out index_map); same band-group pipeline
    as _kernel. P = 1 (luma) or 2 (interleaved [Cb|Cr] rows — the whole
    128-lane row is produced, so the write-only out block is fully
    covered)."""
    del slot_ref, tin_ref                       # slot consumed by index_map
    t = pl.program_id(0)

    def dma(sbuf, tt, p):
        start = pl.multiple_of(4 * B * tt, 8)
        return pltpu.make_async_copy(
            hbm_ref.at[p, pl.ds(start, span_p)],
            scratch.at[sbuf, p],
            sems.at[sbuf, p],
        )

    sbuf = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for p in range(P):
            dma(0, 0, p).start()

    @pl.when(t + 1 < ngrp)
    def _():
        for p in range(P):
            dma(1 - sbuf, t + 1, p).start()

    for p in range(P):
        dma(sbuf, t, p).wait()
    if out_dtype == jnp.uint8:
        # dot-assembly emission: stage the 16 (k,m)-rolled pieces as
        # int8 (exact: 8-bit samples, centered), ONE MXU permutation
        # dot (_emit_perm), then B full-width row stores — instead of
        # 16*B masked T-lane stores (~8x vreg write amplification)
        bigs = [jnp.concatenate(
            [scratch[sbuf, p][4 * b:4 * b + T] for b in range(B)],
            axis=0) for p in range(P)]
        big = bigs[0] if P == 1 else jnp.concatenate(bigs, axis=0)
        bt = big.astype(jnp.int32).T            # (Wp_p, 128)
        r3 = bt.reshape(ntx0, 4, 128)
        for i in range(T):
            k, m = i // 4, i % 4
            q = r3[:, m, :]
            if k:
                q = pltpu.roll(q, ntx0 - k, axis=0)
            xscr[:, i * 128:(i + 1) * 128] = (q - 128).astype(jnp.int8)
        d = jax.lax.dot_general(
            xscr[...], perm_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32) + 128
        PW = P * T * T
        for b in range(B):
            out_ref[b * ntx:(b + 1) * ntx, :] = \
                d[:ntx, b * PW:(b + 1) * PW].astype(out_dtype)
        return
    for p in range(P):
        span = scratch[sbuf, p]                 # (span_p, Wp_p)
        big = jnp.concatenate([span[4 * b:4 * b + T] for b in range(B)],
                              axis=0)
        bt = big.astype(jnp.int32).T            # (Wp_p, B*T)
        r3 = bt.reshape(ntx0, 4, B * T)
        for c in range(T):
            q = r3[:, c % 4, :]
            if c // 4:
                q = pltpu.roll(q, ntx0 - c // 4, axis=0)
            qo = q[:ntx].astype(out_dtype)
            base = p * T * T + c * T
            for b in range(B):
                out_ref[b * ntx:(b + 1) * ntx, base:base + T] = \
                    qo[:, b * T:(b + 1) * T]


def update_tile_table_pallas(table, padded, slot, T, interpret=False):
    """In-place insert of one frame's tile rows into the persistent
    tile-table stack at `slot` — the kernel writes the slot's blocks
    directly (scalar-prefetched out index_map + input/output aliasing),
    replacing the build-then-dynamic_update_slice round trip (~2 full
    table copies per 4K frame).

    table : (NSLOTS*nty_p*ntx, P*T*T) — P=2 for the interleaved
            [Cb 64 | Cr 64] chroma table.
    padded: (P, Hp, Wp) int16 edge-padded plane stack (P matches table).
    slot  : () int32 (traced).
    Returns the updated table (same buffer when XLA honors the alias)."""
    P, Hp, Wp = padded.shape
    nty = (Hp - T + 4) // 4
    ntx = (Wp - T + 4) // 4
    Wp_p = -(-Wp // 128) * 128
    ntx0 = Wp_p // 4
    nty_p = -(-nty // B) * B
    ngrp = nty_p // B
    span = 4 * (B - 1) + T
    span_p = -(-span // 8) * 8
    Hp_p = 4 * B * (ngrp - 1) + span_p
    padded = jnp.pad(padded, ((0, 0), (0, max(0, Hp_p - Hp)),
                              (0, Wp_p - Wp)))
    nrows, width = table.shape
    assert width == P * T * T, (width, P, T)
    # the out block addresses the 2D table DIRECTLY (one band group =
    # B*ntx consecutive rows): reshaping the persistent table to a 4D
    # block view is NOT a bitcast under XLA's tiled uint8 layouts and
    # cost a full table copy per call (~7 ms/frame at 4K — the real
    # "table build" wall, see PERF_NOTES round 5)
    out = pl.pallas_call(
        functools.partial(_upd_kernel, T=T, ngrp=ngrp, ntx=ntx, ntx0=ntx0,
                          span_p=span_p, out_dtype=table.dtype, P=P),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ngrp,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (B * ntx, width),
                lambda t, s: (s[0] * ngrp + t, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, P, span_p, Wp_p), jnp.int16),
                pltpu.VMEM((ntx0, T * 128), jnp.int8),
                pltpu.SemaphoreType.DMA((2, P)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(jnp.asarray(slot, jnp.int32).reshape(1), padded,
      jnp.asarray(_emit_perm(T, P)[:, :B * width]), table)
    return out
