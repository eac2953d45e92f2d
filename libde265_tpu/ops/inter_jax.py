"""Batched inter prediction (MC) on TPU — bit-exact (spec 8.5.3.3).

MC path hierarchy (consolidated round 2): mc_tile_jax.py is the
PRODUCTION path (tile-table gather + folded-phase taps, used by the fused
frame program); inter_dense_jax.py is its dense per-4x4 oracle and the
hybrid device path's MC; THIS module supplies the shared tap tables and
the per-(w,h)-bucket kernels kept for the acceleration_speed differential
harness — it is not on the decode path.

TPU-first design: PUs are bucketed by (w, h); each bucket is one batched
gather + two separable tap passes. Integer/fractional phases are unified by
using impulse taps ([...64...]) for integer positions — algebraically
identical to the spec's special cases, so ONE kernel covers all 16 qpel /
64 epel phases (the reference needs a 4x4 function table per phase,
acceleration.h qpel[4][4]).

Reference pictures are stacked into one (R, H, W) tensor; each PU row indexes
its reference — the device-side mirror of the DPB.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .inter_ref import QPEL_FILTERS, EPEL_FILTERS

# tap tables with impulse row for phase 0
QPEL_TAPS = np.zeros((4, 8), np.int32)
QPEL_TAPS[0, 3] = 64
for ph, taps in QPEL_FILTERS.items():
    QPEL_TAPS[ph] = taps
EPEL_TAPS = np.zeros((8, 4), np.int32)
EPEL_TAPS[0, 1] = 64
for ph, taps in EPEL_FILTERS.items():
    EPEL_TAPS[ph] = taps


@partial(jax.jit, static_argnames=("w", "h", "bitdepth"))
def mc_luma_batch(refstack, ref_slot, xs, ys, fx, fy, w, h, bitdepth=8):
    """refstack (R,H,W) int32; per-PU integer position (xs,ys) (mv applied),
    fractional phases fx,fy in 0..3. Returns (N,h,w) int32 14-bit."""
    R, H, W = refstack.shape
    shift1 = min(4, bitdepth - 8)
    iy = jnp.clip(ys[:, None] + jnp.arange(-3, h + 4)[None, :], 0, H - 1)
    ix = jnp.clip(xs[:, None] + jnp.arange(-3, w + 4)[None, :], 0, W - 1)
    win = refstack[ref_slot[:, None, None], iy[:, :, None], ix[:, None, :]]
    taps_h = jnp.asarray(QPEL_TAPS)[fx]          # (N,8)
    taps_v = jnp.asarray(QPEL_TAPS)[fy]
    tmp = sum(taps_h[:, k, None, None] * win[:, :, k:k + w] for k in range(8))
    tmp = tmp >> shift1
    out = sum(taps_v[:, k, None, None] * tmp[:, k:k + h, :] for k in range(8))
    return out >> 6


@partial(jax.jit, static_argnames=("w", "h", "bitdepth"))
def mc_chroma_batch(refstack, ref_slot, xs, ys, fx, fy, w, h, bitdepth=8):
    """Chroma 4-tap, phases 0..7; coordinates in chroma samples."""
    R, H, W = refstack.shape
    shift1 = min(4, bitdepth - 8)
    iy = jnp.clip(ys[:, None] + jnp.arange(-1, h + 2)[None, :], 0, H - 1)
    ix = jnp.clip(xs[:, None] + jnp.arange(-1, w + 2)[None, :], 0, W - 1)
    win = refstack[ref_slot[:, None, None], iy[:, :, None], ix[:, None, :]]
    taps_h = jnp.asarray(EPEL_TAPS)[fx]
    taps_v = jnp.asarray(EPEL_TAPS)[fy]
    tmp = sum(taps_h[:, k, None, None] * win[:, :, k:k + w] for k in range(4))
    tmp = tmp >> shift1
    out = sum(taps_v[:, k, None, None] * tmp[:, k:k + h, :] for k in range(4))
    return out >> 6


@partial(jax.jit, static_argnames=("bitdepth",))
def combine_batch(p0, p1, has1, w0, o0, w1, o1, log2wd, explicit, bitdepth=8):
    """Weighted/default combine for a bucket (spec 8.5.3.3.4).
    p0/p1: (N,h,w) 14-bit; has1 (N,) bool; per-PU weights (N,)."""
    maxv = (1 << bitdepth) - 1
    shift = 14 - bitdepth
    # default
    bi = jnp.clip((p0 + p1 + (1 << shift)) >> (shift + 1), 0, maxv)
    uni = jnp.clip((p0 + (1 << (shift - 1))) >> shift, 0, maxv)
    dflt = jnp.where(has1[:, None, None], bi, uni)
    # explicit weighted
    l2 = log2wd[:, None, None]
    w0_ = w0[:, None, None]; o0_ = o0[:, None, None]
    w1_ = w1[:, None, None]; o1_ = o1[:, None, None]
    ebi = jnp.clip((p0 * w0_ + p1 * w1_ + ((o0_ + o1_ + 1) << l2)) >> (l2 + 1),
                   0, maxv)
    euni = jnp.clip(((p0 * w0_ + (1 << jnp.maximum(l2 - 1, 0)) *
                      (l2 >= 1)) >> l2) + o0_, 0, maxv)
    expl = jnp.where(has1[:, None, None], ebi, euni)
    return jnp.where(explicit[:, None, None], expl, dflt)


def motion_compensate_frame_device(plan, planes, dpb, bitdepth=8):
    """Device-side replacement for inter_ref.motion_compensate_frame.
    planes: [Y,Cb,Cr] numpy (modified in place)."""
    if not plan.pus:
        return
    # build ref stacks: map frame_id -> stack slot
    fids = sorted({pu.ref_dpb[l] for pu in plan.pus for l in range(2)
                   if pu.pred_flag[l]})
    if not fids:
        return
    slot_of = {fid: i for i, fid in enumerate(fids)}
    stacks = []
    for ci in range(3):
        stacks.append(jnp.asarray(np.stack(
            [np.asarray(dpb.pics[f].planes[ci], np.int32) for f in fids])))
    # bucket PUs by (w,h)
    buckets = {}
    for pi, pu in enumerate(plan.pus):
        buckets.setdefault((pu.w, pu.h), []).append(pi)
    for (w, h), idxs in buckets.items():
        preds = {}
        has1 = np.zeros(len(idxs), bool)
        meta = {"w0": np.zeros(len(idxs), np.int32),
                "o0": np.zeros(len(idxs), np.int32),
                "w1": np.zeros(len(idxs), np.int32),
                "o1": np.zeros(len(idxs), np.int32),
                "l2": np.zeros(len(idxs), np.int32),
                "ex": np.zeros(len(idxs), bool)}
        cmeta = [dict(w0=np.zeros(len(idxs), np.int32), o0=np.zeros(len(idxs), np.int32),
                      w1=np.zeros(len(idxs), np.int32), o1=np.zeros(len(idxs), np.int32),
                      l2=np.zeros(len(idxs), np.int32)) for _ in range(2)]
        for ci in range(3):
            cw = w if ci == 0 else w // 2
            chh = h if ci == 0 else h // 2
            p_lists = []
            for slot_i in range(2):
                xs = np.zeros(len(idxs), np.int32)
                ys = np.zeros(len(idxs), np.int32)
                fx = np.zeros(len(idxs), np.int32)
                fy = np.zeros(len(idxs), np.int32)
                slot = np.zeros(len(idxs), np.int32)
                used = np.zeros(len(idxs), bool)
                for k, pi in enumerate(idxs):
                    pu = plan.pus[pi]
                    # slot 0 carries the (single) prediction for uni-pred PUs
                    if slot_i == 0:
                        l = 0 if pu.pred_flag[0] else 1
                    else:
                        l = 1
                        if not (pu.pred_flag[0] and pu.pred_flag[1]):
                            continue
                    if not pu.pred_flag[l]:
                        continue
                    used[k] = True
                    mv = pu.mv[l]
                    if ci == 0:
                        xs[k] = pu.x + (mv[0] >> 2)
                        ys[k] = pu.y + (mv[1] >> 2)
                        fx[k] = mv[0] & 3
                        fy[k] = mv[1] & 3
                    else:
                        xs[k] = (pu.x >> 1) + (mv[0] >> 3)
                        ys[k] = (pu.y >> 1) + (mv[1] >> 3)
                        fx[k] = mv[0] & 7
                        fy[k] = mv[1] & 7
                    slot[k] = slot_of[pu.ref_dpb[l]]
                if ci == 0:
                    p = mc_luma_batch(stacks[0], jnp.asarray(slot), jnp.asarray(xs),
                                      jnp.asarray(ys), jnp.asarray(fx),
                                      jnp.asarray(fy), w, h, bitdepth)
                else:
                    p = mc_chroma_batch(stacks[ci], jnp.asarray(slot), jnp.asarray(xs),
                                        jnp.asarray(ys), jnp.asarray(fx),
                                        jnp.asarray(fy), cw, chh, bitdepth)
                p_lists.append(p)
                if slot_i == 1 and ci == 0:
                    has1 = used
            # weights (per PU, per plane)
            for k, pi in enumerate(idxs):
                pu = plan.pus[pi]
                sh = pu.slice_header
                pw = sh.pred_weight
                if pw is None:
                    continue
                denom = pw.luma_log2_weight_denom if ci == 0 else pw.chroma_log2_weight_denom
                l2 = denom + 14 - bitdepth
                meta_t = meta if ci == 0 else cmeta[ci - 1]
                meta_t["l2"][k] = l2
                if ci == 0:
                    meta["ex"][k] = True
                lists = []
                if pu.pred_flag[0] and pu.pred_flag[1]:
                    lists = [(0, 0), (1, 1)]
                else:
                    lists = [(0, 0 if pu.pred_flag[0] else 1)]
                for slot_i, l in lists:
                    r = pu.ref_idx[l]
                    if ci == 0:
                        wv, ov = pw.luma_weight[l][r], pw.luma_offset[l][r]
                    else:
                        wv, ov = pw.chroma_weight[l][r][ci - 1], pw.chroma_offset[l][r][ci - 1]
                    meta_t["w0" if slot_i == 0 else "w1"][k] = wv
                    meta_t["o0" if slot_i == 0 else "o1"][k] = ov
            mt = meta if ci == 0 else cmeta[ci - 1]
            out = combine_batch(p_lists[0], p_lists[1], jnp.asarray(has1),
                                jnp.asarray(mt["w0"]), jnp.asarray(mt["o0"]),
                                jnp.asarray(mt["w1"]), jnp.asarray(mt["o1"]),
                                jnp.asarray(mt["l2"]), jnp.asarray(meta["ex"]),
                                bitdepth)
            out_np = np.asarray(out)
            for k, pi in enumerate(idxs):
                pu = plan.pus[pi]
                if ci == 0:
                    planes[0][pu.y:pu.y + h, pu.x:pu.x + w] = \
                        out_np[k].astype(planes[0].dtype)
                else:
                    planes[ci][pu.y // 2:pu.y // 2 + chh, pu.x // 2:pu.x // 2 + cw] = \
                        out_np[k].astype(planes[ci].dtype)
