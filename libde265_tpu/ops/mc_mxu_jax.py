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


_CHUNK = 1024


def _rank_in_class(cls, ncls=NCLS):
    """(n,) class ids in [0,ncls] (ncls = padding sentinel) -> 0-based
    rank among earlier same-class rows, via chunked triangular bf16
    matmuls: prefix-sum of the one-hot = one-hot @ upper-triangular
    ones, exact in the f32 accumulator (values are 0/1, counts <= n <
    2^24). XLA's native cumsum lowers to ~20 shifted-add passes over
    the (n,ncls) one-hot (~9 ms/4K-frame on v5e); this is ~0.2 ms of
    MXU work. Sentinel rows get rank 0 (their one-hot is all-zero;
    callers route them to drop slots anyway)."""
    n = cls.shape[0]
    G = -(-n // _CHUNK)
    npad = G * _CHUNK
    cp = jnp.concatenate([cls, jnp.full(npad - n, ncls, cls.dtype)]) \
        if npad != n else cls
    oh = (cp[None, :] == jnp.arange(ncls, dtype=cls.dtype)[:, None])
    oh3 = oh.astype(jnp.bfloat16).reshape(ncls, G, _CHUNK)
    tri = jnp.asarray(np.triu(np.ones((_CHUNK, _CHUNK), np.float32)),
                      jnp.bfloat16)                  # tri[c,j] = c <= j
    pref = jnp.einsum("xgc,cj->xgj", oh3, tri,
                      preferred_element_type=jnp.float32)
    totals = pref[:, :, -1].astype(jnp.int32)        # (ncls,G) chunk counts
    offs = jnp.cumsum(totals, axis=1) - totals       # exclusive, tiny
    rank = pref.astype(jnp.int32) - 1 + offs[:, :, None]
    rank_n = (rank * oh.reshape(ncls, G, _CHUNK).astype(jnp.int32)) \
        .sum(axis=0).reshape(npad)
    return rank_n[:n]


def _sort_dest(cls, caps, ncls=NCLS):
    """(n,) class ids in [0,ncls] (ncls = padding sentinel) ->
    destination row in the class-sorted layout. Real ids land at
    base[cls] + rank-within-class; sentinels land at unique
    out-of-bounds slots (>= L) for mode='drop' scatters."""
    n = cls.shape[0]
    base = np.concatenate([[0], np.cumsum(caps)]).astype(np.int64)
    L = int(base[-1])
    rank = _rank_in_class(cls, ncls)
    d = jnp.asarray(base[:-1], jnp.int32)[jnp.clip(cls, 0, ncls - 1)] + rank
    return jnp.where(cls < ncls, d,
                     L + jnp.arange(n, dtype=jnp.int32)), L


def mc_luma_mxu(table_y, nty, ntx, bx, by, mvx, mvy, slot, H, W, shift1,
                caps, bitdepth=8):
    """One list's luma prediction for all N 4x4 blocks: (N,4,4) int32
    (14-bit scale). Drop-in for mc_tile_jax._luma_pred_tile; caps =
    (hcaps, vcaps) from caps_from_counts via ProgramCfg.mc_caps."""
    hcaps, vcaps = caps
    N = bx.shape[0]
    nh = sum(1 for c in hcaps if c)
    nv = sum(1 for c in vcaps if c)
    idx, hcls, vcls = luma_geom(jnp, bx, by, mvx, mvy, slot, nty, ntx, H, W)
    in_dt = jnp.bfloat16 if bitdepth == 8 else jnp.float32
    prec = jax.lax.Precision.HIGHEST

    # counting sort by h-class: permute the gather indices. A single
    # populated class (constant-phase stream, e.g. global-pan content)
    # needs no sort at all — every row takes the same matrix.
    if nh > 1:
        dest1, Lh = _sort_dest(hcls.astype(jnp.int32), hcaps)
        idx1 = jnp.zeros(Lh, idx.dtype).at[dest1].set(idx,
                                                      unique_indices=True)
        vcls1 = jnp.full(Lh, NCLS, jnp.int32).at[dest1].set(
            vcls.astype(jnp.int32), unique_indices=True)
    else:
        dest1, Lh = None, N
        idx1, vcls1 = idx, vcls.astype(jnp.int32)

    win = table_y[idx1]                                   # (Lh, 256)
    tmps = []
    off = 0
    for h in range(NCLS):
        c = hcaps[h] if nh > 1 else (Lh if hcaps[h] else 0)
        if c == 0:
            continue
        tmps.append(jnp.matmul(win[off:off + c].astype(in_dt),
                               jnp.asarray(MH_NP[h], in_dt),
                               preferred_element_type=jnp.float32,
                               precision=prec))           # (c, 80) f32
        off += c
    tmp = jnp.concatenate(tmps) if len(tmps) > 1 else tmps[0]   # (Lh, 80)
    if shift1:
        tmp = (tmp.astype(jnp.int32) >> shift1).astype(jnp.float32)

    # second counting sort: re-permute the f32 rows by v-class (skipped
    # when a single v-class covers every row — order is irrelevant then)
    if nv > 1:
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
                                   precision=prec))       # (c, 16)
            off += c
        out_sorted = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        pos = dest2[dest1] if dest1 is not None else dest2[:N]
    else:
        v_only = next(v for v in range(NCLS) if vcaps[v])
        out_sorted = jnp.matmul(tmp, jnp.asarray(MV_NP[v_only],
                                                 jnp.float32),
                                precision=prec)           # (Lh, 16)
        pos = dest1
    gathered = out_sorted if pos is None else out_sorted[pos]
    out = gathered[:N].astype(jnp.int32) >> 6             # (N, 16)
    # lane j*4+i -> (N, i, j)
    return out.reshape(-1, 4, 4).transpose(0, 2, 1)


# ------------------------------------------------------------- chroma
# Same class-sorted design for the 2x2 chroma blocks, with two twists:
# 32 classes (8 eighth-pel phases x 4 tile misalignments) and BOTH
# planes ride one pipeline: Cb|Cr windows concatenate on lanes to a
# (., 128) block and the per-class matrices are block-diagonal pairs,
# so one h-matmul (c,128)@(128,32) and one v-matmul (c,32)@(32,8)
# produce both planes (the class geometry is identical for Cb and Cr).
# Reference: epel SSE paths acceleration.h:115-201, mc_chroma
# motion.cc:172-223.
from .mc_tile_jax import TH_C

NCLS_C = 32


def _mk_class_mats_c():
    """MHC2[p]: (128,32) h-pass, per plane tmp[j*8+r] =
    sum_u win[(u+j)*8+r] * TH_C[p][u] (j<2, r<8).  MVC2[p]: (32,8)
    v-pass, per plane out[j*2+i] = sum_u tmp[j*8+(i+u)] * TH_C[p][u]
    (j<2, i<2). Both are two copies of the single-plane matrix on the
    block diagonal."""
    MHC = np.zeros((NCLS_C, 64, 16), np.int32)
    MVC = np.zeros((NCLS_C, 16, 4), np.int32)
    for p in range(NCLS_C):
        for j in range(2):
            for r in range(8):
                for u in range(7):
                    MHC[p, (u + j) * 8 + r, j * 8 + r] = TH_C[p, u]
        for j in range(2):
            for i in range(2):
                for u in range(7):
                    MVC[p, j * 8 + (i + u), j * 2 + i] = TH_C[p, u]
    MHC2 = np.zeros((NCLS_C, 128, 32), np.int32)
    MVC2 = np.zeros((NCLS_C, 32, 8), np.int32)
    MHC2[:, :64, :16] = MHC
    MHC2[:, 64:, 16:] = MHC
    MVC2[:, :16, :4] = MVC
    MVC2[:, 16:, 4:] = MVC
    return MHC2, MVC2


MHC2_NP, MVC2_NP = _mk_class_mats_c()


def chroma_geom(xp, bx, by, mvx, mvy, slot, nty, ntx, Hc, Wc):
    """Table row index + h/v class per 2x2 chroma block; mirrors
    mc_tile_jax._chroma_pred_tile's window geometry. bx/by are LUMA
    block origins (as in mc_frame_tile)."""
    x0 = xp.clip((bx >> 1) + (mvx >> 3) - 1, -7, Wc + 1)
    y0 = xp.clip((by >> 1) + (mvy >> 3) - 1, -7, Hc + 1)
    tx = (x0 + 8) >> 2
    ty = (y0 + 8) >> 2
    dx = (x0 + 8) & 3
    dy = (y0 + 8) & 3
    idx = (slot * nty + ty) * ntx + tx
    hcls = (mvx & 7) * 4 + dx
    vcls = (mvy & 7) * 4 + dy
    return idx, hcls, vcls


def chroma_class_counts(mv_lane, H, W):
    """Host: (N,2) (mvx,mvy) for ONE lane, luma geometry H/W ->
    ((32,) h counts, (32,) v counts)."""
    N = mv_lane.shape[0]
    n_bx = W // 4
    bx = (np.arange(N, dtype=np.int64) % n_bx) * 4
    by = (np.arange(N, dtype=np.int64) // n_bx) * 4
    Hc, Wc = H // 2, W // 2
    nty, ntx = (Hc + 12) // 4, (Wc + 12) // 4
    _, hcls, vcls = chroma_geom(np, bx, by,
                                mv_lane[:, 0].astype(np.int64),
                                mv_lane[:, 1].astype(np.int64),
                                np.zeros(N, np.int64), nty, ntx, Hc, Wc)
    return (np.bincount(hcls, minlength=NCLS_C),
            np.bincount(vcls, minlength=NCLS_C))


def mc_chroma_mxu(table_c2, nty, ntx, bx, by, mvx, mvy, slot,
                  Hc, Wc, shift1, caps, bitdepth=8):
    """One list's Cb AND Cr predictions for all N 2x2 blocks:
    ((N,2,2), (N,2,2)) int32 (14-bit scale). table_c2 carries the
    interleaved [Cb 64 | Cr 64] rows, so both planes' windows arrive
    with ONE row gather. Drop-in pair for two
    mc_tile_jax._chroma_pred_tile calls; caps = ProgramCfg.mc_caps_c."""
    hcaps, vcaps = caps
    N = bx.shape[0]
    nh = sum(1 for c in hcaps if c)
    nv = sum(1 for c in vcaps if c)
    idx, hcls, vcls = chroma_geom(jnp, bx, by, mvx, mvy, slot, nty, ntx,
                                  Hc, Wc)
    in_dt = jnp.bfloat16 if bitdepth == 8 else jnp.float32
    prec = jax.lax.Precision.HIGHEST

    if nh > 1:
        dest1, Lh = _sort_dest(hcls.astype(jnp.int32), hcaps, NCLS_C)
        idx1 = jnp.zeros(Lh, idx.dtype).at[dest1].set(idx,
                                                      unique_indices=True)
        vcls1 = jnp.full(Lh, NCLS_C, jnp.int32).at[dest1].set(
            vcls.astype(jnp.int32), unique_indices=True)
    else:
        dest1, Lh = None, N
        idx1, vcls1 = idx, vcls.astype(jnp.int32)

    win = table_c2[idx1]                                  # (Lh, 128)
    tmps = []
    off = 0
    for h in range(NCLS_C):
        c = hcaps[h] if nh > 1 else (Lh if hcaps[h] else 0)
        if c == 0:
            continue
        tmps.append(jnp.matmul(win[off:off + c].astype(in_dt),
                               jnp.asarray(MHC2_NP[h], in_dt),
                               preferred_element_type=jnp.float32,
                               precision=prec))           # (c, 32) f32
        off += c
    tmp = jnp.concatenate(tmps) if len(tmps) > 1 else tmps[0]   # (Lh, 32)
    if shift1:
        tmp = (tmp.astype(jnp.int32) >> shift1).astype(jnp.float32)

    if nv > 1:
        dest2, Lv = _sort_dest(vcls1, vcaps, NCLS_C)
        tmp2 = jnp.zeros((Lv, 32), jnp.float32).at[dest2].set(
            tmp, mode="drop", unique_indices=True)
        outs = []
        off = 0
        for v in range(NCLS_C):
            c = vcaps[v]
            if c == 0:
                continue
            outs.append(jnp.matmul(tmp2[off:off + c],
                                   jnp.asarray(MVC2_NP[v], jnp.float32),
                                   precision=prec))       # (c, 8)
            off += c
        out_sorted = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        pos = dest2[dest1] if dest1 is not None else dest2[:N]
    else:
        v_only = next(v for v in range(NCLS_C) if vcaps[v])
        out_sorted = jnp.matmul(tmp, jnp.asarray(MVC2_NP[v_only],
                                                 jnp.float32),
                                precision=prec)           # (Lh, 8)
        pos = dest1
    gathered = out_sorted if pos is None else out_sorted[pos]
    g = gathered[:N].astype(jnp.int32) >> 6               # (N, 8)
    # plane lanes [4*pl + j*2 + i] -> (N, i, j)
    cb = g[:, :4].reshape(-1, 2, 2).transpose(0, 2, 1)
    cr = g[:, 4:].reshape(-1, 2, 2).transpose(0, 2, 1)
    return cb, cr
