"""Class-sorted MXU motion compensation: the luma tap passes as matmuls.

The VPU form of the two shifted-tap passes (mc_tile_jax._luma_pred_tile)
costs ~9 ms/frame at 4K: 22 shifted int32 multiply-adds over (N,80/64)
lanes that XLA cannot fuse into anything denser. But within one
(fractional-phase, tile-misalignment) CLASS the shifted tap vector is a
CONSTANT, so the pass over a class-contiguous row block is a dense
matmul with a small banded matrix — MXU work. Measured on v5e
(tools/probe_mxu_mc.py): gather + h-matmul + row-permute + v-matmul =
2.3 ms/frame vs 13.1 ms for gather + VPU taps at 4K.

Pipeline (per prediction list):
  1. classes: hcls = (mvx&3)*4 + dx, vcls = (mvy&3)*4 + dy  (16 each),
     where dx/dy is the window's misalignment inside its stride-4 tile
     (mc_tile_jax geometry, incl. the edge clamp).
  2. counting sort by hcls ON DEVICE (nothing extra is uploaded): a
     (N,16) one-hot cumsum ranks blocks within each class. Class slice
     boundaries are STATIC per-stream capacities (ProgramCfg.mc_caps,
     computed by stream_cfg from the same numpy geometry) so every
     matmul below has a static shape; over-capacity is impossible (the
     caps are per-stream maxima over the identical class derivation)
     and padding rows gather table row 0, then drop at the final
     un-sort gather.
  3. gather table rows in h-sorted order (the sort costs no extra data
     movement — it permutes the 1-D gather indices).
  4. per-h-class (seg,256)@(256,80) matmul. bf16 x bf16 -> f32 for
     8-bit: every sample < 2^8 and |tap| <= 58 is exact in bf16, each
     product is exact in the f32 accumulator, and |tmp| <= 255*112 =
     28560 < 2^24 so the sum is exact. f32 x f32 (HIGHEST precision:
     >= bf16x3 passes — exact because the tap operand has no low bf16
     half and samples fit 16 mantissa bits) for 10-bit.
  5. re-sort the (.,80) rows by vcls (second counting sort, one f32
     row scatter) and run per-v-class (seg,80)@(80,16) f32 matmuls
     (|out| <= 28560*112 = 3.2M < 2^24: exact).
  6. un-sort by one (N,) row gather, >> 6 in int32 (f32->int32 cast is
     exact: the values are integers).

Reference kernels: qpel SSE paths acceleration.h:29-201, mc_luma
motion.cc:49-170.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .mc_tile_jax import TH_Y

NCLS = 16


def _mk_class_mats():
    """MH[p]: (256,80) h-pass matrix, tmp[j*16+r] = sum_c win[c*16+r] *
    TH_Y[p][c-j].  MV[p]: (80,16) v-pass matrix, out[j*4+i] =
    sum_k tmp[j*16+k] * TH_Y[p][k-i]."""
    MH = np.zeros((NCLS, 256, 80), np.int32)
    MV = np.zeros((NCLS, 80, 16), np.int32)
    for p in range(NCLS):
        for j in range(5):
            for r in range(16):
                for u in range(11):
                    MH[p, (u + j) * 16 + r, j * 16 + r] = TH_Y[p, u]
        for j in range(4):
            for i in range(4):
                for u in range(11):
                    MV[p, j * 16 + (i + u), j * 4 + i] = TH_Y[p, u]
    return MH, MV


MH_NP, MV_NP = _mk_class_mats()


def luma_geom(xp, bx, by, mvx, mvy, slot, nty, ntx, H, W):
    """Shared device/host geometry: table row index + h/v class per 4x4
    block. xp = jnp (trace) or np (stream_cfg capacity analysis) — the
    two MUST agree or the static capacities under-provision."""
    x0 = xp.clip(bx + (mvx >> 2) - 3, -14, W + 1)
    y0 = xp.clip(by + (mvy >> 2) - 3, -14, H + 1)
    tx = (x0 + 16) >> 2
    ty = (y0 + 16) >> 2
    dx = (x0 + 16) & 3
    dy = (y0 + 16) & 3
    idx = (slot * nty + ty) * ntx + tx
    hcls = (mvx & 3) * 4 + dx
    vcls = (mvy & 3) * 4 + dy
    return idx, hcls, vcls


def luma_class_counts(mv_lane, H, W):
    """Host: (N,2) int (mvx,mvy) for ONE lane in device block-raster
    order -> ((16,) h-class counts, (16,) v-class counts) (numpy)."""
    N = mv_lane.shape[0]
    n_bx = W // 4
    bx = (np.arange(N, dtype=np.int64) % n_bx) * 4
    by = (np.arange(N, dtype=np.int64) // n_bx) * 4
    nty, ntx = (H + 20) // 4, (W + 20) // 4
    _, hcls, vcls = luma_geom(np, bx, by,
                              mv_lane[:, 0].astype(np.int64),
                              mv_lane[:, 1].astype(np.int64),
                              np.zeros(N, np.int64), nty, ntx, H, W)
    return (np.bincount(hcls, minlength=NCLS),
            np.bincount(vcls, minlength=NCLS))


def caps_from_counts(hmax, vmax):
    """(16,) per-class max counts (h and v) -> hashable cfg capacities,
    padded at 1/8-pow2 granularity (bounds compiled-shape variety;
    wastes <=12.5% of the padded rows)."""
    def pad(n):
        n = int(n)
        if n == 0:
            return 0
        if n <= 128:
            return 128
        step = 1 << max(3, n.bit_length() - 3)
        return -(-n // step) * step
    return (tuple(pad(h) for h in hmax), tuple(pad(v) for v in vmax))


def _sort_dest(cls, caps):
    """(n,) class ids in [0,16] (16 = padding sentinel) -> destination
    row in the class-sorted layout. Real ids land at
    base[cls] + rank-within-class; sentinels land at unique
    out-of-bounds slots (>= L) for mode='drop' scatters."""
    n = cls.shape[0]
    base = np.concatenate([[0], np.cumsum(caps)]).astype(np.int64)
    L = int(base[-1])
    oh = (cls[:, None] == jnp.arange(NCLS, dtype=cls.dtype)[None, :]) \
        .astype(jnp.int32)
    rank = (jnp.cumsum(oh, axis=0) * oh).sum(axis=1) - 1
    d = jnp.asarray(base[:-1], jnp.int32)[jnp.clip(cls, 0, NCLS - 1)] + rank
    return jnp.where(cls < NCLS, d,
                     L + jnp.arange(n, dtype=jnp.int32)), L


def mc_luma_mxu(table_y, nty, ntx, bx, by, mvx, mvy, slot, H, W, shift1,
                caps, bitdepth=8):
    """One list's luma prediction for all N 4x4 blocks: (N,4,4) int32
    (14-bit scale). Drop-in for mc_tile_jax._luma_pred_tile; caps =
    (hcaps, vcaps) from caps_from_counts via ProgramCfg.mc_caps."""
    hcaps, vcaps = caps
    idx, hcls, vcls = luma_geom(jnp, bx, by, mvx, mvy, slot, nty, ntx, H, W)

    # counting sort by h-class: permute the gather indices
    dest1, Lh = _sort_dest(hcls.astype(jnp.int32), hcaps)
    idx1 = jnp.zeros(Lh, idx.dtype).at[dest1].set(idx,
                                                  unique_indices=True)
    vcls1 = jnp.full(Lh, NCLS, jnp.int32).at[dest1].set(
        vcls.astype(jnp.int32), unique_indices=True)

    win = table_y[idx1]                                   # (Lh, 256)
    in_dt = jnp.bfloat16 if bitdepth == 8 else jnp.float32
    prec = jax.lax.Precision.HIGHEST
    tmps = []
    off = 0
    for h in range(NCLS):
        c = hcaps[h]
        if c == 0:
            continue
        tmps.append(jnp.matmul(win[off:off + c].astype(in_dt),
                               jnp.asarray(MH_NP[h], in_dt),
                               preferred_element_type=jnp.float32,
                               precision=prec))           # (c, 80) f32
        off += c
    tmp = jnp.concatenate(tmps)                           # (Lh, 80)
    if shift1:
        tmp = (tmp.astype(jnp.int32) >> shift1).astype(jnp.float32)

    # second counting sort: re-permute the f32 rows by v-class
    dest2, Lv = _sort_dest(vcls1, vcaps)
    tmp2 = jnp.zeros((Lv, 80), jnp.float32).at[dest2].set(
        tmp, mode="drop", unique_indices=True)
    outs = []
    off = 0
    for v in range(NCLS):
        c = vcaps[v]
        if c == 0:
            continue
        outs.append(jnp.matmul(tmp2[off:off + c],
                               jnp.asarray(MV_NP[v], jnp.float32),
                               precision=prec))           # (c, 16)
        off += c
    out_sorted = jnp.concatenate(outs)                    # (Lv, 16)
    pos = dest2[dest1]                                    # (N,)
    out = out_sorted[pos].astype(jnp.int32) >> 6          # (N, 16)
    # lane j*4+i -> (N, i, j)
    return out.reshape(-1, 4, 4).transpose(0, 2, 1)
