"""Whole-frame vectorized deblocking on TPU (JAX/XLA), bit-exact.

TPU-first split: the *host* derives per-edge-segment metadata (boundary
strength, per-side QP, filter-off masks) as dense tensors from the FramePlan
grids — cheap numpy work that mirrors derive_edgeFlags/derive_boundaryStrength
(/root/reference/libde265/deblock.cc:130-377). The *device* then runs the
purely data-parallel filter math (8.7.2.5) over all segments at once:
V pass on the whole frame, then H pass. No per-CTB locks — XLA dataflow
replaces the reference's progress-lock pipeline (deblock.cc:914-989).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .deblock_ref import BETA_TABLE, TC_TABLE, derive_bs, _filters_off, _edge_enabled
from .deblock_ref import CHROMA_QP_TABLE

BETA_ARR = np.asarray(BETA_TABLE, np.int32)
TC_ARR = np.asarray(TC_TABLE, np.int32)


def plan_luma_metadata(plan, vertical):
    """Host-side: per 4-sample segment on the 8x8 edge grid, produce
    (bs, qp_avg, beta_off, tc_off, p_off, q_off) dense arrays.
    Shape: vertical: (H/4, W/8 - ...) segments at x=8,16,..; horizontal
    transposed equivalently."""
    W, H = plan.W, plan.H
    sh_map = {int(s.slice_segment_address): s for s in plan.slice_headers}
    sps = plan.sps

    if vertical:
        xs = list(range(8, W, 8))
        ys = list(range(0, H, 4))
    else:
        xs = list(range(0, W, 4))
        ys = list(range(8, H, 8))
    n_e = len(xs) if vertical else len(ys)
    n_s = len(ys) if vertical else len(xs)
    bs = np.zeros((n_s, n_e), np.int32)
    qp = np.zeros((n_s, n_e), np.int32)
    beta_off = np.zeros((n_s, n_e), np.int32)
    tc_off = np.zeros((n_s, n_e), np.int32)
    p_off = np.zeros((n_s, n_e), bool)
    q_off = np.zeros((n_s, n_e), bool)
    log2ctb = sps.Log2CtbSizeY

    for ei, e in enumerate(xs if vertical else ys):
        for si, s in enumerate(ys if vertical else xs):
            x, y = (e, s) if vertical else (s, e)
            edge = plan.tu_boundary[y >> 2, x >> 2] | \
                plan.cb_boundary[y >> 2, x >> 2] | plan.pb_boundary[y >> 2, x >> 2]
            if not (edge & (1 if vertical else 2)):
                continue
            if not _edge_enabled(plan, x, y, vertical, sh_map):
                continue
            sh = sh_map.get(int(plan.ctb_slice_seg[y >> log2ctb, x >> log2ctb]))
            if sh is None or sh.slice_deblocking_filter_disabled_flag:
                continue
            b = derive_bs(plan, x, y, vertical)
            if b == 0:
                continue
            bs[si, ei] = b
            if vertical:
                qp_p = int(plan.qp_y[y >> 2, (x - 1) >> 2])
                po = _filters_off(plan, (x - 1) >> 2, y >> 2)
                qo = _filters_off(plan, x >> 2, y >> 2)
            else:
                qp_p = int(plan.qp_y[(y - 1) >> 2, x >> 2])
                po = _filters_off(plan, x >> 2, (y - 1) >> 2)
                qo = _filters_off(plan, x >> 2, y >> 2)
            qp_q = int(plan.qp_y[y >> 2, x >> 2])
            qp[si, ei] = (qp_p + qp_q + 1) >> 1
            beta_off[si, ei] = sh.slice_beta_offset
            tc_off[si, ei] = sh.slice_tc_offset
            p_off[si, ei] = po
            q_off[si, ei] = qo
    return bs, qp, beta_off, tc_off, p_off, q_off


@partial(jax.jit, static_argnames=("vertical", "bitdepth"))
def deblock_luma_pass(Y, bs, qp, beta_off, tc_off, p_off, q_off,
                      vertical, bitdepth=8):
    """Y: (H,W) int32 plane. Segment metadata from plan_luma_metadata.
    Returns filtered plane (spec 8.7.2.5.3/4/7)."""
    H, W = Y.shape
    if not vertical:
        # transpose: horizontal edges become vertical in the transposed frame
        Yt = Y.T
        out = deblock_luma_pass(Yt, bs, qp, beta_off, tc_off, p_off, q_off,
                                True, bitdepth)
        return out.T
    n_s, n_e = bs.shape
    # segment (si, ei) covers rows 4*si..4*si+3 at edge column x=8*(ei+1).
    # The per-edge 8-col windows [8e+4, 8e+12) are disjoint and tile the
    # plane, so the "gather" is a pure reshape (XLA serializes the naive
    # elementwise gather — hundreds of ms at 4K; this is free):
    seg = Y[:, 4:4 + 8 * n_e].reshape(n_s, 4, n_e, 8).transpose(0, 2, 1, 3)
    p = seg[..., 3::-1]   # p0..p3 at idx 0..3
    q = seg[..., 4:]

    beta = jnp.asarray(BETA_ARR)[jnp.clip(qp + beta_off, 0, 51)] << (bitdepth - 8)
    tc = jnp.asarray(TC_ARR)[jnp.clip(qp + 2 * (bs - 1) + tc_off, 0, 53)] << (bitdepth - 8)

    dp0 = jnp.abs(p[..., 0, 2] - 2 * p[..., 0, 1] + p[..., 0, 0])
    dp3 = jnp.abs(p[..., 3, 2] - 2 * p[..., 3, 1] + p[..., 3, 0])
    dq0 = jnp.abs(q[..., 0, 2] - 2 * q[..., 0, 1] + q[..., 0, 0])
    dq3 = jnp.abs(q[..., 3, 2] - 2 * q[..., 3, 1] + q[..., 3, 0])
    d = dp0 + dp3 + dq0 + dq3
    active = (bs > 0) & (d < beta) & (tc > 0)

    def strong_line(i):
        dpi = jnp.where(i == 0, dp0, dp3)
        dqi = jnp.where(i == 0, dq0, dq3)
        return (2 * (dpi + dqi) < (beta >> 2)) & \
            (jnp.abs(p[..., i, 3] - p[..., i, 0]) +
             jnp.abs(q[..., i, 0] - q[..., i, 3]) < (beta >> 3)) & \
            (jnp.abs(p[..., i, 0] - q[..., i, 0]) < ((5 * tc + 1) >> 1))
    strong = strong_line(0) & strong_line(3)               # (n_s, n_e)

    maxv = (1 << bitdepth) - 1
    tc_ = tc[..., None]                                    # broadcast over lines
    # strong filter (all 4 lines)
    p0, p1, p2, p3 = (p[..., k] for k in range(4))
    q0, q1, q2, q3 = (q[..., k] for k in range(4))
    sp0 = jnp.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   p0 - 2 * tc_, p0 + 2 * tc_)
    sp1 = jnp.clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - 2 * tc_, p1 + 2 * tc_)
    sp2 = jnp.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                   p2 - 2 * tc_, p2 + 2 * tc_)
    sq0 = jnp.clip((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3,
                   q0 - 2 * tc_, q0 + 2 * tc_)
    sq1 = jnp.clip((p0 + q0 + q1 + q2 + 2) >> 2, q1 - 2 * tc_, q1 + 2 * tc_)
    sq2 = jnp.clip((p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3,
                   q2 - 2 * tc_, q2 + 2 * tc_)
    # weak filter
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    weak_line = jnp.abs(delta) < 10 * tc_
    dlt = jnp.clip(delta, -tc_, tc_)
    wp0 = jnp.clip(p0 + dlt, 0, maxv)
    wq0 = jnp.clip(q0 - dlt, 0, maxv)
    dEp = ((dp0 + dp3) < ((beta + (beta >> 1)) >> 3))[..., None]
    dEq = ((dq0 + dq3) < ((beta + (beta >> 1)) >> 3))[..., None]
    dp_ = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1,
                   -(tc_ >> 1), tc_ >> 1)
    dq_ = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1,
                   -(tc_ >> 1), tc_ >> 1)
    wp1 = jnp.clip(p1 + dp_, 0, maxv)
    wq1 = jnp.clip(q1 + dq_, 0, maxv)

    st = strong[..., None]
    act = active[..., None]
    po = p_off[..., None]
    qo = q_off[..., None]
    np0 = jnp.where(st, sp0, jnp.where(weak_line, wp0, p0))
    np1 = jnp.where(st, sp1, jnp.where(weak_line & dEp, wp1, p1))
    np2 = jnp.where(st, sp2, p2)
    nq0 = jnp.where(st, sq0, jnp.where(weak_line, wq0, q0))
    nq1 = jnp.where(st, sq1, jnp.where(weak_line & dEq, wq1, q1))
    nq2 = jnp.where(st, sq2, q2)
    np0 = jnp.where(act & ~po, jnp.clip(np0, 0, maxv), p0)
    np1 = jnp.where(act & ~po, jnp.clip(np1, 0, maxv), p1)
    np2 = jnp.where(act & ~po, jnp.clip(np2, 0, maxv), p2)
    nq0 = jnp.where(act & ~qo, jnp.clip(nq0, 0, maxv), q0)
    nq1 = jnp.where(act & ~qo, jnp.clip(nq1, 0, maxv), q1)
    nq2 = jnp.where(act & ~qo, jnp.clip(nq2, 0, maxv), q2)

    newseg = jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3], axis=-1)
    strip = newseg.transpose(0, 2, 1, 3).reshape(n_s * 4, 8 * n_e)
    return Y.at[:, 4:4 + 8 * n_e].set(strip)


def plan_chroma_metadata(plan, vertical):
    """Host-side chroma metadata: segments of 2 chroma lines on the 16-luma
    grid; bS==2 only (spec 8.7.2)."""
    W, H = plan.W, plan.H
    sps, pps = plan.sps, plan.pps
    sh_map = {int(s.slice_segment_address): s for s in plan.slice_headers}
    log2ctb = sps.Log2CtbSizeY
    if vertical:
        xs = list(range(16, W, 16))
        ys = list(range(0, H, 4))
    else:
        xs = list(range(0, W, 4))
        ys = list(range(16, H, 16))
    n_e = len(xs) if vertical else len(ys)
    n_s = len(ys) if vertical else len(xs)
    act = np.zeros((2, n_s, n_e), bool)   # per chroma component
    tc = np.zeros((2, n_s, n_e), np.int32)
    p_off = np.zeros((n_s, n_e), bool)
    q_off = np.zeros((n_s, n_e), bool)
    for ei, e in enumerate(xs if vertical else ys):
        for si, s in enumerate(ys if vertical else xs):
            x, y = (e, s) if vertical else (s, e)
            edge = plan.tu_boundary[y >> 2, x >> 2] | plan.cb_boundary[y >> 2, x >> 2]
            if not (edge & (1 if vertical else 2)):
                continue
            if not _edge_enabled(plan, x, y, vertical, sh_map):
                continue
            sh = sh_map.get(int(plan.ctb_slice_seg[y >> log2ctb, x >> log2ctb]))
            if sh is None or sh.slice_deblocking_filter_disabled_flag:
                continue
            if derive_bs(plan, x, y, vertical) != 2:
                continue
            if vertical:
                qp_p = int(plan.qp_y[y >> 2, (x - 1) >> 2])
                po = _filters_off(plan, (x - 1) >> 2, y >> 2)
                qo = _filters_off(plan, x >> 2, y >> 2)
            else:
                qp_p = int(plan.qp_y[(y - 1) >> 2, x >> 2])
                po = _filters_off(plan, x >> 2, (y - 1) >> 2)
                qo = _filters_off(plan, x >> 2, y >> 2)
            qp_q = int(plan.qp_y[y >> 2, x >> 2])
            for c in range(2):
                qoff = pps.pic_cb_qp_offset if c == 0 else pps.pic_cr_qp_offset
                qpi = min(57, max(0, ((qp_p + qp_q + 1) >> 1) + qoff))
                if sps.ChromaArrayType == 1:
                    qpc = qpi if qpi < 30 else (
                        qpi - 6 if qpi > 43 else CHROMA_QP_TABLE[qpi - 30])
                else:
                    qpc = min(qpi, 51)
                Qt = min(53, max(0, qpc + 2 + sh.slice_tc_offset))
                tcv = TC_TABLE[Qt] << (sps.BitDepthC - 8)
                if tcv > 0:
                    act[c, si, ei] = True
                    tc[c, si, ei] = tcv
            p_off[si, ei] = po
            q_off[si, ei] = qo
    return act, tc, p_off, q_off


@partial(jax.jit, static_argnames=("vertical", "bitdepth"))
def deblock_chroma_pass(C, act, tc, p_off, q_off, vertical, bitdepth=8):
    """C: (H/2, W/2) int32 chroma plane; metadata for this component."""
    if not vertical:
        return deblock_chroma_pass(C.T, act, tc, p_off, q_off, True, bitdepth).T
    n_s, n_e = act.shape
    # edges at chroma x = 8*(ei+1); the 4-col windows [8e+6, 8e+10) are
    # disjoint with stride 8 -> reshape, not gather (see luma pass)
    seg = C[:, 6:6 + 8 * n_e].reshape(n_s, 2, n_e, 8).transpose(0, 2, 1, 3)
    p1, p0, q0, q1 = (seg[..., k] for k in range(4))
    maxv = (1 << bitdepth) - 1
    tc_ = tc[..., None]
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc_, tc_)
    act_ = act[..., None]
    np0 = jnp.where(act_ & ~p_off[..., None], jnp.clip(p0 + delta, 0, maxv), p0)
    nq0 = jnp.where(act_ & ~q_off[..., None], jnp.clip(q0 - delta, 0, maxv), q0)
    newseg = jnp.stack([p1, np0, nq0, q1, seg[..., 4], seg[..., 5],
                        seg[..., 6], seg[..., 7]], axis=-1)
    strip = newseg.transpose(0, 2, 1, 3).reshape(n_s * 2, 8 * n_e)
    return C.at[:, 6:6 + 8 * n_e].set(strip)


def deblock_frame_jax(plan, planes):
    """Drop-in replacement for deblock_ref.deblock_frame using the device."""
    Y = jnp.asarray(planes[0], jnp.int32)
    for vertical in (True, False):
        meta = plan_luma_metadata(plan, vertical)
        if meta[0].size:
            Y = deblock_luma_pass(Y, *[jnp.asarray(m) for m in meta],
                                  vertical=vertical, bitdepth=plan.sps.BitDepthY)
    planes[0][...] = np.asarray(Y).astype(planes[0].dtype)
    if plan.sps.ChromaArrayType == 0:
        return
    for vertical in (True, False):
        act, tc, p_off, q_off = plan_chroma_metadata(plan, vertical)
        if not act.size:
            continue
        for c in (0, 1):
            Cp = jnp.asarray(planes[c + 1], jnp.int32)
            Cp = deblock_chroma_pass(Cp, jnp.asarray(act[c]), jnp.asarray(tc[c]),
                                     jnp.asarray(p_off), jnp.asarray(q_off),
                                     vertical=vertical,
                                     bitdepth=plan.sps.BitDepthC)
            planes[c + 1][...] = np.asarray(Cp).astype(planes[c + 1].dtype)
