"""VMEM-resident serial intra reconstruction scan (Mosaic kernel).

Replaces the XLA wavefront-level fori_loop (intra_fused.intra_stage):
that loop pays a full-plane HBM copy per level (~0.9 ms x ~1000 levels
at 4K) because the border gather reads the same buffer the scatter
writes. Here the whole CTB-row band lives in VMEM and every TU is a few
hundred VPU/MXU ops, so an I-frame costs milliseconds instead of a
second — matching how the reference decodes intra CTBs inline at full
speed (/root/reference/libde265/intrapred.cc:880-1164, slice.cc:3424).

Execution model
  grid = (NB bands, K TU-slots per band), fully serial. TUs are ordered
  by (CTB row, tile-scan z order) — decode order per tile, which
  respects every intra dependency (availability excludes cross-tile /
  cross-slice / not-yet-decoded neighbours, intra_fused._border_ok).
  The band (CTB-row x padded width, int32) streams through VMEM as the
  kernel's output block (input_output_aliased to the plane, initialised
  from the input block at slot 0); the previous band's bottom row is
  carried across bands in a persistent VMEM halo scratch, so no HBM
  read-after-write hazard exists between pipelined bands.

Per TU (n static per lax.switch class branch):
  1. assemble the spec-order border row (1,256): top row from band/halo
     via two (1,128) tile reads + dynamic lane roll; left column via a
     (BH,128) tile read, lane roll, (BH,1)->(1,BH) transpose, and a
     log-swap lane reversal of the 2n prefix
  2. substitute unavailable samples (8.4.4.2.2): masked-roll forward +
     backward fills over the host-packed availability row
  3. [1,2,1] / strong-bilinear smoothing (8.4.4.2.3) as vector ops,
     gated by the host fflag bit and the in-kernel strong condition
  4. predict all 35 modes as ONE int8 matvec: (ref-128) @ W[mode] with
     the constant bias 8224 and a single >>6 (ops/intra_wtab.py)
  5. DC/mode-26/10 boundary fixups (nested shifts, luma n<32)
  6. add the streamed residual row, clip, and scatter the block into
     the band: per block row, one traced lane roll + two (1,128)
     read-blend-write stores.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..intra_wtab import wtab, lpad, place_mat, colsel_mat

# one packed int32 scalar per TU record (SMEM is 1 MB total — 8 words/TU
# overflows it at 4K):  x:13 | yin:6 | cls:2 | mode:6 | valid:1 | fflag:1
def pack_rec(x, yin, cls, mode, valid, fflag):
    return (x | (yin << 13) | (cls << 19) | (mode << 21)
            | (valid << 27) | (fflag << 28))


# packed availability span:  a:8 | b:9 | anyok:1 | hole:1  — when the
# available border samples form one contiguous run [a,b) (the common
# case; holes only at CIP/slice/tile seams), substitution is two clamps
# instead of the 16-stage masked-roll fill
def pack_span(a, b, anyok, hole):
    return a | (b << 8) | (anyok << 17) | (hole << 18)


def _subst(ref, ok, lane, mid):
    """Reference-sample substitution on a (1,256) row in spec scan
    order: forward fill (previous available) + backward fill (leading
    gap takes the first available) + all-unavailable -> mid-grey."""
    vv = jnp.where(ok, ref, 0)
    have = ok
    for s in (1, 2, 4, 8, 16, 32, 64, 128):
        hr = (pltpu.roll(have.astype(jnp.int32), s, axis=1) != 0) \
            & (lane >= s)
        sv = pltpu.roll(vv, s, axis=1)
        vv = jnp.where(have, vv, sv)
        have = have | hr
    bv = jnp.where(ok, ref, 0)
    bh = ok
    for s in (1, 2, 4, 8, 16, 32, 64, 128):
        # static roll shifts must be non-negative: 256-s == -s (mod 256)
        hr = (pltpu.roll(bh.astype(jnp.int32), 256 - s, axis=1) != 0) \
            & (lane < 256 - s)
        sv = pltpu.roll(bv, 256 - s, axis=1)
        bv = jnp.where(bh, bv, sv)
        bh = bh | hr
    filled = jnp.where(have, vv, bv)
    anyok = jnp.max(ok.astype(jnp.int32)) != 0
    return jnp.where(anyok, filled, mid)


def _reverse_prefix(v, lane, p):
    """Reverse lanes [0,p) of a (1,256) row (p static power of two)."""
    s = p >> 1
    while s:
        sw = jnp.where((lane // s) % 2 == 0,
                       pltpu.roll(v, 256 - s, axis=1),
                       pltpu.roll(v, s, axis=1))
        v = jnp.where(lane < p, sw, v)
        s >>= 1
    return v


def _wdot(ref, wsl, bd):
    """ref (rows, Lp) int32 in [0, maxv] -> ref @ wsl with int8 MXU
    operands: direct centered int8 for 8-bit, hi/lo split (256*hi + lo)
    for 10/12-bit — the W rows sum to 64, so the -128 centering folds
    into the constant 8224 either way."""
    dims = (((1,), (0,)), ((), ()))
    if bd == 8:
        r8 = (ref - 128).astype(jnp.int8)
        return jax.lax.dot_general(r8, wsl, dims,
                                   preferred_element_type=jnp.int32)
    hi8 = (ref >> 8).astype(jnp.int8)
    lo8 = ((ref & 255) - 128).astype(jnp.int8)
    return 256 * jax.lax.dot_general(hi8, wsl, dims,
                                     preferred_element_type=jnp.int32) \
        + jax.lax.dot_general(lo8, wsl, dims,
                              preferred_element_type=jnp.int32)


def build_scan(classes, BH, C, NB, K, planes, bd, strong, luma, RW,
               interpret=False, ablate=frozenset(), span_only=False):
    """span_only: the host proved every TU's availability is one
    contiguous run (no CIP/seam holes anywhere in the stream) — skip
    compiling the masked-roll fill branch entirely (the lax.cond pair
    roughly doubles Mosaic compile time)."""
    """Returns scan(scalars, avail, resid..., plane3d...) -> plane3d...

    classes: present log2 sizes (switch branch order = index into it)
    BH: band height (CTB rows in this plane's sample units)
    C: width in 128-lane tiles;  NB/K: grid dims;  planes: 1 or 2
    RW: residual row lanes (max n*n over classes, >=256)
    """
    assert bd in (8, 10, 12), "int8 / hi-lo int8-split matvec paths"
    maxv = (1 << bd) - 1
    mid = 1 << (bd - 1)
    nc = len(classes)
    wtabs = [jnp.asarray(wtab(l)) for l in classes]
    ptabs = [jnp.asarray(place_mat(l)) for l in classes]
    # column-select tables only where the DC/26 column fixups exist
    nsc = nc if luma else 0
    stabs = [jnp.asarray(colsel_mat(l)) for l in classes] if luma else []

    def kernel(s_ref, sp_ref, *rest):
        rgs = rest[:planes]              # per-plane row-index prefetch
        av_ref = rest[planes]
        rest = rest[planes + 1:]
        rs = rest[:planes]
        ws = rest[planes:planes + nc]
        ps = rest[planes + nc:planes + 2 * nc]
        ss = rest[planes + 2 * nc:planes + 2 * nc + nsc]
        o0 = planes + 2 * nc + nsc
        pins = rest[o0:o0 + planes]
        pouts = rest[o0 + planes:o0 + 2 * planes]
        scr = rest[o0 + 2 * planes:]
        halos = scr[:planes]
        tmp = scr[planes]
        tmp3 = scr[planes + 1]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            for p in range(planes):
                pouts[p][...] = pins[p][...]

        t = i * K + j
        w = s_ref[t]
        x = w & 0x1FFF
        yin = (w >> 13) & 63
        cls = (w >> 19) & 3
        mode = (w >> 21) & 63
        valid = (w >> 27) & 1
        fflag_b = ((w >> 28) & 1) != 0
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)

        def _plane_body(log2, wref, pref, sref, band, halo, resrow, rg):
            n = 1 << log2
            c2 = 2 * n
            L = 4 * n + 1
            Lp = lpad(log2)
            nsq = n * n
            xm1 = jnp.maximum(x - 1, 0)
            cxt = xm1 // 128
            oxt = xm1 % 128
            cxt1 = jnp.minimum(cxt + 1, C - 1)
            ytop = jnp.maximum(yin - 1, 0)
            istop = yin == 0
            t0 = jnp.where(istop, halo[pl.ds(0, 1), cxt, :],
                           band[pl.ds(ytop, 1), cxt, :])
            t1 = jnp.where(istop, halo[pl.ds(0, 1), cxt1, :],
                           band[pl.ds(ytop, 1), cxt1, :])
            tmp[0:1, 0:128] = t0
            tmp[0:1, 128:256] = t1
            # window lane m = sample(x-1+m); when x==0 the clamped read
            # start (xm1=0) is one sample late -> extra +1 roll (lane 0,
            # the out-of-frame corner, is availability-masked anyway)
            top = pltpu.roll(tmp[0:1, :],
                             (x == 0).astype(jnp.int32) - oxt, axis=1)
            lc = pltpu.roll(band[pl.ds(0, BH), cxt, :], -oxt, axis=1)
            # (BH,1) -> (1,BH) staged into tmp; lanes >= BH hold stale
            # garbage — harmless: every lane that can reach the matvec
            # is either availability-masked or hits a zero W row
            tmp[1:2, 0:BH] = lc[:, 0:1].reshape(1, BH)
            col = pltpu.roll(tmp[1:2, :], -yin, axis=1)
            lrev = col if "norev" in ablate else \
                _reverse_prefix(col, lane, c2)
            tseg = pltpu.roll(top, c2, axis=1)
            ref = jnp.where(lane < c2, lrev, tseg)
            if "noasm" in ablate:
                ref = jnp.where(lane < 999, mid, ref)
            if "nosub" not in ablate:
                sp = sp_ref[t]
                a_ = sp & 255
                b_ = (sp >> 8) & 511
                anyok = ((sp >> 17) & 1) != 0
                hole = (sp >> 18) & 1

                def _fast(r):
                    va = pltpu.roll(r, -a_, axis=1)[:, 0:1]
                    vb = pltpu.roll(r, 1 - b_, axis=1)[:, 0:1]
                    r = jnp.where(lane < a_, va,
                                  jnp.where(lane >= b_, vb, r))
                    return jnp.where(anyok, r,
                                     jnp.zeros_like(r) + mid)

                def _slow(r):
                    ok = (av_ref[pl.ds(rgs[0][t] % 8, 1), :] != 0) \
                        & (lane < L)
                    return _subst(r, ok, lane, mid)

                if span_only:
                    ref = _fast(ref)
                else:
                    ref = jax.lax.cond(hole != 0, _slow, _fast, ref)
            # ---- smoothing (8.4.4.2.3)
            fflag = fflag_b
            if n >= 8 and "nosmooth" not in ablate:
                f121 = (pltpu.roll(ref, 1, axis=1) + 2 * ref
                        + pltpu.roll(ref, 255, axis=1) + 2) >> 2
                f121 = jnp.where((lane == 0) | (lane == L - 1), ref,
                                 f121)
                if strong and luma and n == 32:
                    corner = ref[:, c2:c2 + 1]
                    tend = ref[:, 4 * n:4 * n + 1]
                    lend = ref[:, 0:1]
                    tmid = ref[:, c2 + n:c2 + n + 1]
                    lmid = ref[:, c2 - n:c2 - n + 1]
                    bt = 1 << (bd - 5)
                    sflag = fflag & \
                        (jnp.abs(corner + tend - 2 * tmid) < bt) & \
                        (jnp.abs(corner + lend - 2 * lmid) < bt)
                    di = jnp.abs(lane - c2)
                    endv = jnp.where(lane > c2, tend, lend)
                    bil = ((2 * n - di) * corner + di * endv + n) >> 6
                    bil = jnp.where((di == 0) | (di == 2 * n), ref, bil)
                    ref = jnp.where(sflag, bil,
                                    jnp.where(fflag, f121, ref))
                else:
                    ref = jnp.where(fflag, f121, ref)
            # ---- 35-mode prediction: one int8 matvec (intra_wtab.py)
            if "nodot" in ablate:
                pred = jnp.zeros((1, nsq), jnp.int32) + ref[0:1, 0:1]
            else:
                wsl = wref[pl.ds(mode * Lp, Lp), :]
                pred = (_wdot(ref[0:1, :Lp], wsl, bd) + 8224) >> 6
            isdc = mode == 1
            is26 = mode == 26
            is10 = mode == 10
            fix = luma and n < 32 and "nofix" not in ablate
            # ---- residual + clip
            resv = resrow[pl.ds(rg % 8, 1), :]
            if "nores" in ablate:
                out = jnp.clip(pred, 0, maxv)
            else:
                out = jnp.clip(pred + resv[:, :nsq], 0, maxv)   # (1,nsq)
            # ---- place the flat row-major block into n VMEM rows with
            # ONE MXU dot against a 0/1 matrix (the per-row roll/blend
            # loop this replaces was 75% of the kernel in ablation);
            # out is in [0,maxv] so the int8 centering is exact
            dims = (((1,), (0,)), ((), ()))
            blk = _wdot(out, pref[...], bd)
            lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, n * 128), 1)
            blk = (blk + 128 * ((lane128 % 128) < n)).reshape(n, 128)
            tmp3[0:n, 0:128] = blk
            if fix:
                # ---- boundary fixups (luma n<32), patched into the
                # staged block UNDER pl.when: only DC/10/26 TUs pay the
                # ~0.5 us of dc-sum + reversal + select dots (round-5;
                # the unconditional form charged every TU)
                @pl.when(isdc | is26 | is10)
                def _():
                    corner = ref[:, c2:c2 + 1]
                    top0 = ref[:, c2 + 1:c2 + 2]
                    left0 = ref[:, c2 - 1:c2]
                    mleft = (lane >= c2 - n) & (lane < c2)
                    mtop = (lane > c2) & (lane <= c2 + n)
                    dc = (jnp.sum(jnp.where(mleft | mtop, ref, 0)) + n) \
                        >> (log2 + 1)
                    tf = pltpu.roll(ref, 256 - (c2 + 1), axis=1)
                    dcrow = (tf + 3 * dc + 2) >> 2
                    r10 = jnp.clip(left0 + ((tf - corner) >> 1), 0, maxv)
                    row0 = jnp.where(isdc, dcrow, r10)[:, :nsq]
                    out0 = jnp.clip(row0 + resv[:, :nsq], 0, maxv)
                    cur0 = tmp3[0:1, 0:n]
                    tmp3[0:1, 0:n] = jnp.where(isdc | is10,
                                               out0[:, :n], cur0)
                    # column-0 fixups vectorized over rows: left column
                    # via prefix reversal + transpose; residual column
                    # via the select dot (exact hi/lo int8 split)
                    lv = pltpu.roll(ref, 256 - (c2 - n), axis=1)
                    lv = _reverse_prefix(lv, lane, n)  # lane k = left[k]
                    lcol = lv[0:1, :n].reshape(n, 1)
                    r_ = resv[:, :nsq]
                    hi8 = (r_ >> 8).astype(jnp.int8)
                    lo8 = ((r_ & 255) - 128).astype(jnp.int8)
                    rc = (256 * jax.lax.dot_general(
                              hi8, sref[...], dims,
                              preferred_element_type=jnp.int32)
                          + jax.lax.dot_general(
                              lo8, sref[...], dims,
                              preferred_element_type=jnp.int32) + 128)
                    rcol = rc[0:1, :n].reshape(n, 1)
                    cv = jnp.where(
                        is26,
                        jnp.clip(top0 + ((lcol - corner) >> 1), 0, maxv),
                        (lcol + 3 * dc + 2) >> 2)
                    rown = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                    cv = jnp.where(isdc & (rown == 0),
                                   (left0 + 2 * dc + top0 + 2) >> 2, cv)
                    cv = jnp.clip(cv + rcol, 0, maxv)
                    curc = tmp3[0:n, 0:1]
                    tmp3[0:n, 0:1] = jnp.where(isdc | is26, cv, curc)
            # ---- strip RMW: stage, roll to lane offset, blend 2 tiles
            ox = x % 128
            cx = x // 128
            cx1 = jnp.minimum(cx + 1, C - 1)
            rolled = pltpu.roll(tmp3[0:n, :], ox, axis=1)   # (n,256)
            m = (lane >= ox) & (lane < ox + n)
            if "noscat" in ablate:
                band[pl.ds(yin, 1), cx, :] = rolled[0:1, :128]
            else:
                w0 = band[pl.ds(yin, n), cx, :]
                band[pl.ds(yin, n), cx, :] = \
                    jnp.where(m[:, :128], rolled[:, :128], w0)
                w1 = band[pl.ds(yin, n), cx1, :]
                band[pl.ds(yin, n), cx1, :] = \
                    jnp.where(m[:, 128:], rolled[:, 128:], w1)

        def _pair_body(log2, wref, pref):
            """planes==2: Cb and Cr share geometry/mode/availability, so
            assembly, substitution, smoothing and the W matvec run ONCE
            on (2,256)/(2,Lp) rows (VPU sublane-parallel, same op count
            as one plane); only the placement dot + strip RMW stay
            per-plane. No boundary fixups (chroma)."""
            n = 1 << log2
            c2 = 2 * n
            L = 4 * n + 1
            Lp = lpad(log2)
            nsq = n * n
            xm1 = jnp.maximum(x - 1, 0)
            cxt = xm1 // 128
            oxt = xm1 % 128
            cxt1 = jnp.minimum(cxt + 1, C - 1)
            ytop = jnp.maximum(yin - 1, 0)
            istop = yin == 0
            for p in range(2):
                band, halo = pouts[p], halos[p]
                tmp[p:p + 1, 0:128] = jnp.where(
                    istop, halo[pl.ds(0, 1), cxt, :],
                    band[pl.ds(ytop, 1), cxt, :])
                tmp[p:p + 1, 128:256] = jnp.where(
                    istop, halo[pl.ds(0, 1), cxt1, :],
                    band[pl.ds(ytop, 1), cxt1, :])
                lc = pltpu.roll(band[pl.ds(0, BH), cxt, :], -oxt,
                                axis=1)
                tmp[2 + p:3 + p, 0:BH] = lc[:, 0:1].reshape(1, BH)
            top = pltpu.roll(tmp[0:2, :],
                             (x == 0).astype(jnp.int32) - oxt, axis=1)
            col = pltpu.roll(tmp[2:4, :], -yin, axis=1)
            lrev = _reverse_prefix(col, lane, c2)
            tseg = pltpu.roll(top, c2, axis=1)
            ref = jnp.where(lane < c2, lrev, tseg)        # (2,256)
            sp = sp_ref[t]
            a_ = sp & 255
            b_ = (sp >> 8) & 511
            anyok = ((sp >> 17) & 1) != 0
            hole = (sp >> 18) & 1

            def _fast(r):
                va = pltpu.roll(r, -a_, axis=1)[:, 0:1]
                vb = pltpu.roll(r, 1 - b_, axis=1)[:, 0:1]
                r = jnp.where(lane < a_, va,
                              jnp.where(lane >= b_, vb, r))
                return jnp.where(anyok, r, jnp.zeros_like(r) + mid)

            def _slow(r):
                ok = (av_ref[pl.ds(rgs[0][t] % 8, 1), :] != 0) \
                    & (lane < L)
                return _subst(r, ok, lane, mid)

            if span_only:
                ref = _fast(ref)
            else:
                ref = jax.lax.cond(hole != 0, _slow, _fast, ref)
            if n >= 8:
                f121 = (pltpu.roll(ref, 1, axis=1) + 2 * ref
                        + pltpu.roll(ref, 255, axis=1) + 2) >> 2
                f121 = jnp.where((lane == 0) | (lane == L - 1), ref,
                                 f121)
                ref = jnp.where(fflag_b, f121, ref)
            wsl = wref[pl.ds(mode * Lp, Lp), :]
            dims = (((1,), (0,)), ((), ()))
            pred = (_wdot(ref[0:2, :Lp], wsl, bd) + 8224) >> 6  # (2,nsq)
            ox = x % 128
            cx = x // 128
            cx1 = jnp.minimum(cx + 1, C - 1)
            m = (lane >= ox) & (lane < ox + n)
            lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, n * 128), 1)
            placed = 128 * ((lane128 % 128) < n)
            for p in range(2):
                band = pouts[p]
                resv = rs[p][pl.ds(rgs[p][t] % 8, 1), :]
                out = jnp.clip(pred[p:p + 1] + resv[:, :nsq], 0, maxv)
                blk = (_wdot(out, pref[...], bd)
                       + placed).reshape(n, 128)
                tmp3[0:n, 0:128] = blk
                rolled = pltpu.roll(tmp3[0:n, :], ox, axis=1)
                w0 = band[pl.ds(yin, n), cx, :]
                band[pl.ds(yin, n), cx, :] = \
                    jnp.where(m[:, :128], rolled[:, :128], w0)
                w1 = band[pl.ds(yin, n), cx1, :]
                band[pl.ds(yin, n), cx1, :] = \
                    jnp.where(m[:, 128:], rolled[:, 128:], w1)

        def cls_branch(ci):
            def run():
                if planes == 2:
                    _pair_body(classes[ci], ws[ci], ps[ci])
                else:
                    _plane_body(classes[ci], ws[ci], ps[ci],
                                ss[ci] if luma else None, pouts[0],
                                halos[0], rs[0], rgs[0][t])
            return run

        @pl.when(valid != 0 if "nobody" not in ablate else valid > 9)
        def _():
            if nc == 1:
                cls_branch(0)()
            else:
                jax.lax.switch(cls, [cls_branch(ci) for ci in range(nc)])

        @pl.when(j == K - 1)
        def _():
            for p in range(planes):
                halos[p][pl.ds(0, 1)] = pouts[p][pl.ds(BH - 1, 1)]

    # index_map args: (*grid indices, scalar ref) — mc_tables.py:216.
    # Mosaic requires sublane-dim blocks divisible by 8: stream avail/
    # resid in 8-TU-slot blocks (K is a multiple of 8), select row t%8
    # in-kernel.
    # Mosaic requires sublane-dim blocks divisible by 8, and the row
    # reorder (class-row layout -> scan slot order) happens HERE: the
    # avail/resid block index comes from the per-plane row-index
    # prefetch arrays — a zero-cost gather the XLA-gather prologue this
    # replaces paid ~320 ms/frame for at 4K.
    if "noio" in ablate:          # ablation: constant block maps (no
        def _avmap(i, j, s, sp, *rg):   # per-step avail/resid streaming)
            return (0, 0)

        def _rsmap(p):
            return lambda i, j, s, sp, *rg: (0, 0)
    else:
        def _avmap(i, j, s, sp, *rg):
            return (rg[0][i * K + j] // 8, 0)

        def _rsmap(p):
            return lambda i, j, s, sp, *rg: (rg[p][i * K + j] // 8, 0)

    in_specs = (
        [pl.BlockSpec((8, 256), _avmap, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((8, RW), _rsmap(p), memory_space=pltpu.VMEM)
           for p in range(planes)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * nc + nsc)
        + [pl.BlockSpec((BH, C, 128), lambda i, j, *s: (i, 0, 0),
                        memory_space=pltpu.VMEM)] * planes)
    out_specs = [pl.BlockSpec((BH, C, 128), lambda i, j, *s: (i, 0, 0),
                              memory_space=pltpu.VMEM)] * planes
    if planes == 1:
        out_specs = out_specs[0]
    scratch = [pltpu.VMEM((8, C, 128), jnp.int32)] * planes \
        + [pltpu.VMEM((8, 256), jnp.int32),
           pltpu.VMEM((32, 256), jnp.int32)]
    # operand index of plane p input (incl. the prefetch operands)
    npre = 2 + planes
    alias = {npre + 1 + planes + 2 * nc + nsc + p: p
             for p in range(planes)}

    def scan(scalars, spans, rowgs, avail, resids, planes3d):
        out_shape = [jax.ShapeDtypeStruct((NB * BH, C, 128), jnp.int32)
                     for _ in range(planes)]
        if planes == 1:
            out_shape = out_shape[0]
        f = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=npre, grid=(NB, K),
                in_specs=in_specs, out_specs=out_specs,
                scratch_shapes=scratch),
            out_shape=out_shape,
            # donation is only a memory optimization (every output block
            # is fully written via the j==0 copy); interpret-mode
            # donation on CPU has been implicated in later use-after-
            # free segfaults elsewhere in the process, so skip it there
            input_output_aliases={} if interpret else alias,
            interpret=interpret)
        return f(scalars, spans, *rowgs, avail, *resids, *wtabs, *ptabs,
                 *stabs, *planes3d)

    return scan
