"""Pallas (Mosaic TPU) kernel: whole-plane SAO in one VMEM pass.

The XLA form (ops/sao_jax.sao_apply + the plan_sao_device expansion)
costs ~6 ms/4K frame across the three planes — ~25 full-plane int32
passes that XLA fails to fuse. Here the planner folds everything the
filter needs into three compact int8 maps (see
filter_plan_jax.plan_sao_compact):

  mode : 0 off / 1 band / 2 edge   (skip + neighbor-availability and
         picture-boundary blocking already folded into 0)
  aux  : band position (mode 1) or EO class (mode 2)
  offs : the 4 SaoOffsetVal entries per sample

and the kernel applies band + edge offsets in a single pass over
(BH, W) row blocks. Vertical neighbors come from a 2-row halo side
input (block-boundary rows, gathered in XLA); horizontal neighbors are
lane rolls — the row-end wraparound feeds garbage only into samples
whose mode the planner already zeroed (picture boundary rule).

Reference: sao.cc:140-200 (per-CTB apply), 8.7.3.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 64          # rows per block


def _kernel(x_ref, halo_ref, mode_ref, aux_ref, offs_ref, out_ref, *,
            bitdepth):
    W = x_ref.shape[1]
    maxv = (1 << bitdepth) - 1
    x = x_ref[...]                                   # (BH, W) i32
    xe = jnp.concatenate([halo_ref[0, 0:1], x, halo_ref[0, 1:2]], axis=0)
    up = xe[0:BH]
    dn = xe[2:BH + 2]
    lf = pltpu.roll(x, 1, axis=1)
    rt = pltpu.roll(x, W - 1, axis=1)
    ul = pltpu.roll(up, 1, axis=1)
    ur = pltpu.roll(up, W - 1, axis=1)
    dl = pltpu.roll(dn, 1, axis=1)
    dr = pltpu.roll(dn, W - 1, axis=1)

    aux = aux_ref[...].astype(jnp.int32)
    mode = mode_ref[...].astype(jnp.int32)
    o = [offs_ref[0, k].astype(jnp.int32) for k in range(4)]

    # edge offset (class by aux): a/b neighbor pair per 8.7.3 hPos/vPos
    a = jnp.where(aux == 0, lf, jnp.where(aux == 1, up,
                                          jnp.where(aux == 2, ul, ur)))
    b = jnp.where(aux == 0, rt, jnp.where(aux == 1, dn,
                                          jnp.where(aux == 2, dr, dl)))
    sgn = jnp.sign(x - a) + jnp.sign(x - b)
    de = ((sgn == -2) * o[0] + (sgn == -1) * o[1]
          + (sgn == 1) * o[2] + (sgn == 2) * o[3])
    # band offset (position by aux)
    k = ((x >> (bitdepth - 5)) - aux) & 31
    db = ((k == 0) * o[0] + (k == 1) * o[1]
          + (k == 2) * o[2] + (k == 3) * o[3])
    delta = (mode == 1) * db + (mode == 2) * de
    out_ref[...] = jnp.clip(x + delta, 0, maxv)


@functools.partial(jax.jit, static_argnames=("bitdepth", "interpret"))
def sao_pallas(x, mode, aux, offs, bitdepth=8, interpret=False):
    """x: (H, W) int32 plane; mode/aux: (H, W) int8; offs: (4, H, W)
    int8 (plan_sao_compact outputs). Returns the SAO-filtered plane,
    bit-exact vs sao_jax.sao_apply (differential-tested)."""
    H, W = x.shape
    Hp = -(-H // BH) * BH
    Wp = -(-W // 128) * 128
    nblk = Hp // BH
    pad2 = ((0, Hp - H), (0, Wp - W))
    xp = jnp.pad(x, pad2)
    mp = jnp.pad(mode, pad2)                  # pad mode 0 -> passthrough
    ap = jnp.pad(aux, pad2)
    op = jnp.pad(offs, ((0, 0),) + pad2)
    # block-boundary halo rows (top neighbor of row i*BH, bottom neighbor
    # of row (i+1)*BH-1); clamped rows are masked by mode=0 at picture
    # edges, so their values never reach the output
    r0 = jnp.clip(jnp.arange(nblk) * BH - 1, 0, Hp - 1)
    r1 = jnp.clip((jnp.arange(nblk) + 1) * BH, 0, Hp - 1)
    halo = jnp.stack([xp[r0], xp[r1]], axis=1)      # (nblk, 2, Wp)
    out = pl.pallas_call(
        functools.partial(_kernel, bitdepth=bitdepth),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BH, Wp), lambda i: (i, 0)),
            pl.BlockSpec((1, 2, Wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((BH, Wp), lambda i: (i, 0)),
            pl.BlockSpec((BH, Wp), lambda i: (i, 0)),
            pl.BlockSpec((1, 4, BH, Wp), lambda i: (0, 0, i, 0)),
        ],
        out_specs=pl.BlockSpec((BH, Wp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        interpret=interpret,
    )(xp, halo, mp, ap,
      op.reshape(1, 4, Hp, Wp).transpose(0, 1, 2, 3))
    return out[:H, :W]
