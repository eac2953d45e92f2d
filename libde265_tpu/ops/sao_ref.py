"""Sample Adaptive Offset reference implementation (spec 8.7.3) — numpy.

Capability counterpart of /root/reference/libde265/sao.cc (band/edge offsets
per CTB, out-of-place into a second frame, slice/tile boundary availability).
"""
import numpy as np

# edge-offset neighbor deltas per SaoEoClass (spec Table 8-16)
EO_DELTAS = (
    ((-1, 0), (1, 0)),     # class 0: horizontal
    ((0, -1), (0, 1)),     # class 1: vertical
    ((-1, -1), (1, 1)),    # class 2: 135 deg
    ((1, -1), (-1, 1)),    # class 3: 45 deg
)


def sao_frame(plan, planes):
    """Apply SAO out-of-place; returns new planes list."""
    sps, pps = plan.sps, plan.pps
    out = [p.copy() for p in planes]
    sh_map = {int(sh.slice_segment_address): sh for sh in plan.slice_headers}
    log2 = sps.Log2CtbSizeY
    ctb = 1 << log2
    for cy in range(plan.nctby):
        for cx in range(plan.nctbx):
            sh = sh_map.get(int(plan.ctb_slice_seg[cy, cx]))
            if sh is None:
                continue
            for ci in range(3):
                if ci == 0 and not sh.slice_sao_luma_flag:
                    continue
                if ci > 0 and not sh.slice_sao_chroma_flag:
                    continue
                t = int(plan.sao.type_idx[cy, cx, ci])
                if t == 0:
                    continue
                _sao_ctb(plan, planes, out, cx, cy, ci, t, sh_map)
    return out


def _sao_ctb(plan, planes, out, cx, cy, ci, type_idx, sh_map):
    sps, pps = plan.sps, plan.pps
    # per-axis subsampling (sao.cc:303-304: nSW/nSH scale independently)
    sub_x = 1 if ci == 0 else sps.SubWidthC
    sub_y = 1 if ci == 0 else sps.SubHeightC
    log2 = sps.Log2CtbSizeY
    ctb_w = (1 << log2) // sub_x
    ctb_h = (1 << log2) // sub_y
    src = planes[ci]
    dst = out[ci]
    H, W = src.shape
    x0, y0 = cx * ctb_w, cy * ctb_h
    x1, y1 = min(x0 + ctb_w, W), min(y0 + ctb_h, H)
    bd = sps.BitDepthY if ci == 0 else sps.BitDepthC
    maxv = (1 << bd) - 1
    offsets = plan.sao.offsets[cy, cx, ci]
    # skip flags for pcm / tq bypass are handled per-sample below via grids
    shift = bd - 5
    if type_idx == 1:  # band
        band_pos = int(plan.sao.band_pos[cy, cx, ci])
        block = src[y0:y1, x0:x1].astype(np.int32)
        band = block >> shift
        delta = np.zeros_like(block)
        for k in range(4):
            delta[band == ((band_pos + k) & 31)] = int(offsets[k])
        res = np.clip(block + delta, 0, maxv)
        dst[y0:y1, x0:x1] = _masked(plan, res, block, x0, y0,
                                    sub_x, sub_y).astype(src.dtype)
        return
    # edge
    eo = int(plan.sao.eo_class[cy, cx, ci])
    (dxa, dya), (dxb, dyb) = EO_DELTAS[eo]
    block = src[y0:y1, x0:x1].astype(np.int32)
    h, w = block.shape
    # neighbor samples (from the pre-SAO frame), with availability masking
    ys, xs = np.mgrid[y0:y1, x0:x1]
    na_y, na_x = ys + dya, xs + dxa
    nb_y, nb_x = ys + dyb, xs + dxb
    valid = (na_y >= 0) & (na_y < H) & (na_x >= 0) & (na_x < W) & \
            (nb_y >= 0) & (nb_y < H) & (nb_x >= 0) & (nb_x < W)
    # slice/tile boundary availability (spec 8.7.3: use loop-filter flags)
    valid &= _neighbor_allowed(plan, sh_map, xs * sub_x, ys * sub_y,
                               na_x * sub_x, na_y * sub_y)
    valid &= _neighbor_allowed(plan, sh_map, xs * sub_x, ys * sub_y,
                               nb_x * sub_x, nb_y * sub_y)
    na = src[np.clip(na_y, 0, H - 1), np.clip(na_x, 0, W - 1)].astype(np.int32)
    nb = src[np.clip(nb_y, 0, H - 1), np.clip(nb_x, 0, W - 1)].astype(np.int32)
    sign_a = np.sign(block - na)
    sign_b = np.sign(block - nb)
    edge_idx = sign_a + sign_b  # -2..2
    delta = np.zeros_like(block)
    # category mapping: edgeIdx 2->-? spec: edgeIdx = 2 + sign_a + sign_b ->
    # remap {0:1,1:2,3:3,4:4}: cat1: local min (+off0), cat2 (+off1),
    # cat3 (+off2 neg), cat4 (+off3 neg)
    delta[edge_idx == -2] = int(offsets[0])
    delta[edge_idx == -1] = int(offsets[1])
    delta[edge_idx == 1] = int(offsets[2])
    delta[edge_idx == 2] = int(offsets[3])
    delta[~valid] = 0
    res = np.clip(block + delta, 0, maxv)
    dst[y0:y1, x0:x1] = _masked(plan, res, block, x0, y0,
                                sub_x, sub_y).astype(src.dtype)


def _masked(plan, res, orig, x0, y0, sub_x, sub_y):
    """Per-sample skip for tq-bypass / PCM CUs (spec 8.7.3)."""
    sps = plan.sps
    h, w = res.shape
    ly0, lx0 = y0 * sub_y, x0 * sub_x
    gy0, gx0 = ly0 >> 2, lx0 >> 2
    gh = (h * sub_y + 3) >> 2
    gw = (w * sub_x + 3) >> 2
    tq = plan.tq_bypass[gy0:gy0 + gh, gx0:gx0 + gw]
    pcm = plan.pcm_flag[gy0:gy0 + gh, gx0:gx0 + gw]
    skip4 = (tq > 0)
    if sps.pcm_loop_filter_disable_flag:
        skip4 = skip4 | (pcm > 0)
    if not skip4.any():
        return res
    skip = np.repeat(np.repeat(skip4, 4 // sub_y, 0),
                     4 // sub_x, 1)[:h, :w]
    return np.where(skip, orig, res)


def _neighbor_allowed(plan, sh_map, lx, ly, nx, ny):
    """Vectorized availability of neighbor (nx,ny) for SAO at (lx,ly), both in
    luma coords. Disallowed across tile/slice boundaries when the respective
    loop-filter-across flags are off."""
    sps, pps = plan.sps, plan.pps
    log2 = sps.Log2CtbSizeY
    W = sps.PicWidthInCtbsY
    cxc, cyc = lx >> log2, ly >> log2
    nxc, nyc = np.clip(nx >> log2, 0, W - 1), np.clip(ny >> log2, 0, plan.nctby - 1)
    ok = np.ones(lx.shape, bool)
    same_ctb = (cxc == nxc) & (cyc == nyc)
    if not pps.loop_filter_across_tiles_enabled_flag:
        tid = np.asarray(pps.TileId).reshape(plan.nctby, W)
        ok &= same_ctb | (tid[cyc, cxc] == tid[nyc, nxc])
    # slice check: use the current sample's slice header flag
    sa = plan.slice_addr_rs
    diff_slice = sa[cyc, cxc] != sa[nyc, nxc]
    if diff_slice.any():
        # build per-CTB flag array
        flags = np.ones((plan.nctby, W), bool)
        for seg, sh in sh_map.items():
            pass
        allow = np.ones(lx.shape, bool)
        for idx in np.argwhere(diff_slice):
            iy, ix = idx
            sh = sh_map.get(int(plan.ctb_slice_seg[cyc[iy, ix], cxc[iy, ix]]))
            shn = sh_map.get(int(plan.ctb_slice_seg[nyc[iy, ix], nxc[iy, ix]]))
            a = True
            if sh is not None and not sh.slice_loop_filter_across_slices_enabled_flag:
                a = False
            if shn is not None and not shn.slice_loop_filter_across_slices_enabled_flag:
                a = False
            allow[iy, ix] = a
        ok &= same_ctb | ~diff_slice | allow
    return ok
