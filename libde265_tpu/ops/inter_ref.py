"""Inter prediction / motion compensation reference implementation
(spec 8.5.3.3) — numpy, bit-exact.

Capability counterpart of /root/reference/libde265/motion.cc mc_luma/mc_chroma/
generate_inter_prediction_samples and the fallback MC kernels
(fallback-motion.cc). Edge extension is done with clamped gather indices
(equivalent to the reference's Clip3-based border handling, motion.cc:84-108).
"""
import numpy as np

# luma 8-tap qpel filters (spec Table 8-11), phases 1..3
QPEL_FILTERS = {
    1: (-1, 4, -10, 58, 17, -5, 1, 0),
    2: (-1, 4, -11, 40, 40, -11, 4, -1),
    3: (0, 1, -5, 17, 58, -10, 4, -1),
}
# chroma 4-tap epel filters (spec Table 8-13), phases 1..7
EPEL_FILTERS = {
    1: (-2, 58, 10, -2),
    2: (-4, 54, 16, -2),
    3: (-6, 46, 28, -4),
    4: (-4, 36, 36, -4),
    5: (-4, 28, 46, -6),
    6: (-2, 16, 54, -4),
    7: (-2, 10, 58, -2),
}


def _gather(ref, y0, x0, h, w):
    """(h,w) window at (y0,x0) with edge clamping."""
    H, W = ref.shape
    ys = np.clip(np.arange(y0, y0 + h), 0, H - 1)
    xs = np.clip(np.arange(x0, x0 + w), 0, W - 1)
    return ref[np.ix_(ys, xs)].astype(np.int32)


def mc_luma(ref, x, y, w, h, mv, bitdepth=8):
    """Quarter-pel luma MC -> (h,w) int32 at 14-bit precision
    (pre-weighting), spec 8.5.3.3.3.1."""
    shift1 = min(4, bitdepth - 8)
    xi = x + (mv[0] >> 2)
    yi = y + (mv[1] >> 2)
    fx = mv[0] & 3
    fy = mv[1] & 3
    if fx == 0 and fy == 0:
        block = _gather(ref, yi, xi, h, w)
        return block << (14 - bitdepth)
    if fy == 0:
        src = _gather(ref, yi, xi - 3, h, w + 7)
        f = QPEL_FILTERS[fx]
        out = sum(f[k] * src[:, k:k + w] for k in range(8))
        return out >> shift1
    if fx == 0:
        src = _gather(ref, yi - 3, xi, h + 7, w)
        f = QPEL_FILTERS[fy]
        out = sum(f[k] * src[k:k + h, :] for k in range(8))
        return out >> shift1
    # 2-D: horizontal then vertical
    src = _gather(ref, yi - 3, xi - 3, h + 7, w + 7)
    fh = QPEL_FILTERS[fx]
    tmp = sum(fh[k] * src[:, k:k + w] for k in range(8)) >> shift1
    fv = QPEL_FILTERS[fy]
    out = sum(fv[k] * tmp[k:k + h, :] for k in range(8)) >> 6
    return out


def mc_chroma(ref, x, y, w, h, mv, bitdepth=8, subw=2, subh=2):
    """Eighth-pel chroma MC -> (h,w) int32 14-bit, 8.5.3.3.3.2.
    Format-general per motion.cc:190-191: the luma quarter-pel vector
    scales by 2/SubWidthC (resp. 2/SubHeightC) into chroma eighth-pel
    units, so 4:4:4 uses only even phases and 4:2:2 mixes units."""
    shift1 = min(4, bitdepth - 8)
    mvx = mv[0] * (2 // subw)
    mvy = mv[1] * (2 // subh)
    xi = x + (mvx >> 3)
    yi = y + (mvy >> 3)
    fx = mvx & 7
    fy = mvy & 7
    if fx == 0 and fy == 0:
        return _gather(ref, yi, xi, h, w) << (14 - bitdepth)
    if fy == 0:
        src = _gather(ref, yi, xi - 1, h, w + 3)
        f = EPEL_FILTERS[fx]
        return sum(f[k] * src[:, k:k + w] for k in range(4)) >> shift1
    if fx == 0:
        src = _gather(ref, yi - 1, xi, h + 3, w)
        f = EPEL_FILTERS[fy]
        return sum(f[k] * src[k:k + h, :] for k in range(4)) >> shift1
    src = _gather(ref, yi - 1, xi - 1, h + 3, w + 3)
    fh = EPEL_FILTERS[fx]
    tmp = sum(fh[k] * src[:, k:k + w] for k in range(4)) >> shift1
    fv = EPEL_FILTERS[fy]
    return sum(fv[k] * tmp[k:k + h, :] for k in range(4)) >> 6


def weighted_combine(preds, pu, sh, cidx, bitdepth=8):
    """spec 8.5.3.3.4: default / explicit weighted sample prediction.
    preds: dict list -> 14-bit prediction or None."""
    maxv = (1 << bitdepth) - 1
    pw = sh.pred_weight
    p0, p1 = preds.get(0), preds.get(1)
    if pw is None:
        shift = 14 - bitdepth
        if p0 is not None and p1 is not None:
            return np.clip((p0 + p1 + (1 << shift)) >> (shift + 1), 0, maxv)
        p = p0 if p0 is not None else p1
        return np.clip((p + (1 << (shift - 1))) >> shift, 0, maxv)
    # explicit weighted prediction
    denom = pw.luma_log2_weight_denom if cidx == 0 else pw.chroma_log2_weight_denom
    log2wd = denom + 14 - bitdepth
    o_scale = 1 << (bitdepth - 8)

    def wo(l):
        r = pu.ref_idx[l]
        if cidx == 0:
            return pw.luma_weight[l][r], pw.luma_offset[l][r]
        return pw.chroma_weight[l][r][cidx - 1], pw.chroma_offset[l][r][cidx - 1]
    if p0 is not None and p1 is not None:
        w0, o0 = wo(0)
        w1, o1 = wo(1)
        return np.clip(
            (p0 * w0 + p1 * w1 + ((o0 + o1 + 1) * o_scale << log2wd)) >> (log2wd + 1),
            0, maxv)
    l = 0 if p0 is not None else 1
    p = p0 if p0 is not None else p1
    w, o = wo(l)
    if log2wd >= 1:
        v = ((p * w + (1 << (log2wd - 1))) >> log2wd) + o * o_scale
    else:
        v = p * w + o * o_scale
    return np.clip(v, 0, maxv)


def motion_compensate_frame(plan, planes, dpb):
    """Fill inter-predicted regions of `planes` from DPB reference pictures."""
    sps = plan.sps
    bd_y, bd_c = sps.BitDepthY, sps.BitDepthC
    for pu in plan.pus:
        sh = pu.slice_header
        preds_y = {}
        preds_c = {1: {}, 2: {}}
        for l in range(2):
            if not pu.pred_flag[l]:
                continue
            refpic = dpb.pics[pu.ref_dpb[l]]
            refs = refpic.planes
            if refs is None:
                continue  # corrupted stream: missing reference
            mv = pu.mv[l]
            preds_y[l] = mc_luma(refs[0], pu.x, pu.y, pu.w, pu.h, mv, bd_y)
            if sps.ChromaArrayType != 0:
                sw_, sh2 = sps.SubWidthC, sps.SubHeightC
                for ci in (1, 2):
                    preds_c[ci][l] = mc_chroma(
                        refs[ci], pu.x // sw_, pu.y // sh2,
                        pu.w // sw_, pu.h // sh2, mv, bd_c,
                        subw=sw_, subh=sh2)
        if not preds_y:
            continue
        out = weighted_combine(preds_y, pu, sh, 0, bd_y)
        planes[0][pu.y:pu.y + pu.h, pu.x:pu.x + pu.w] = out.astype(planes[0].dtype)
        if sps.ChromaArrayType != 0:
            cx, cy = pu.x // sps.SubWidthC, pu.y // sps.SubHeightC
            cw, ch = pu.w // sps.SubWidthC, pu.h // sps.SubHeightC
            for ci in (1, 2):
                outc = weighted_combine(preds_c[ci], pu, sh, ci, bd_c)
                planes[ci][cy:cy + ch, cx:cx + cw] = outc.astype(planes[ci].dtype)
