"""Analytic intra-prediction weight tables for the Pallas scan kernel.

HEVC intra prediction (spec 8.4.4.2.4-6; reference intrapred.cc:880-1164)
is, for every mode, a fixed linear map of the substituted border array
followed by ONE rounding shift — planar shifts by log2(n)+1, DC by
log2(n)+1, angular by 5. Scaling each mode's integer weights by
2**(6 - native_shift) unifies the shift to 6 and makes every rounding
bias exactly 32, so the whole 35-mode prediction becomes

    pred[o] = (sum_l W[mode][l, o] * ref[l] + 32) >> 6

with non-negative weights <= 64 (int8-safe). The pieces that do NOT fold
into W (they nest a second shift) stay as cheap in-kernel fixups:
  - DC boundary rows/col (luma n<32, intrapred.cc:1058-1062)
  - mode 26 column-0 / mode 10 row-0 gradient filters (luma n<32)
  - [1,2,1] / strong-bilinear reference smoothing (8.4.4.2.3) — applied
    to the ref row BEFORE the matvec, exactly as predict_core does.

ref lane order is the spec scan order (8.4.4.2.2, same layout as
ops/intra_jax.predict_core): lanes [0, 2n) = left column bottom-up,
lane 2n = corner, lanes (2n, 4n] = top row left-to-right. Output o is
row-major within the block: o = y*n + x.
"""
import numpy as np

from .intra_ref import INTRA_PRED_ANGLE, INV_ANGLE

LOG2S = (2, 3, 4, 5)


def lpad(log2):
    """Padded ref-lane count (sublane-aligned) for a class."""
    return (4 * (1 << log2) + 1 + 7) // 8 * 8


def _angular_w(mode, n):
    """(4n+1, n*n) float weights for angular mode 2..34, native shift 5
    folded to 6 (scale 2). Mirrors predict_core's refbuf construction."""
    L = 4 * n + 1
    c = 2 * n
    ang = INTRA_PRED_ANGLE[mode - 2]
    is_vert = mode >= 18
    # refbuf index m -> ref lane
    # m in [0,n): projref[n-1-m] for ineg = n-m ... wait: refbuf =
    # concat(projref[:, ::-1], mainref); projref[:, i-1] holds ineg=i.
    # reversed: refbuf[m] = projref[:, n-1-m] -> ineg = n - m.
    inv = 0
    if 11 <= mode <= 25:
        inv = INV_ANGLE[mode - 11]
    src = np.zeros(3 * n + 2, np.int64)
    for m in range(n):
        ineg = n - m
        projoff = ((-ineg) * inv + 128) >> 8
        idx = (c - projoff) if is_vert else (c + projoff)
        src[m] = np.clip(idx, 0, L - 1)
    for s in range(2 * n + 1):
        src[n + s] = (c + s) if is_vert else (c - s)
    src[3 * n + 1] = src[3 * n]                     # slack dup
    W = np.zeros((L, n * n), np.int64)
    for j in range(1, n + 1):                        # main-orientation row
        pos = j * ang
        idx = pos >> 5
        fact = pos & 31
        for k in range(n):
            gi = n + k + idx + 1
            gi = min(max(gi, 0), 3 * n + 1)
            gi2 = min(gi + 1, 3 * n + 1)
            o = (j - 1) * n + k if is_vert else k * n + (j - 1)
            W[src[gi], o] += (32 - fact) * 2
            W[src[gi2], o] += fact * 2
    return W


def _planar_w(n):
    L = 4 * n + 1
    c = 2 * n
    log2 = int(np.log2(n))
    scale = 1 << (5 - log2)                          # 6 - (log2+1)
    W = np.zeros((L, n * n), np.int64)
    for y in range(n):
        for x in range(n):
            o = y * n + x
            W[c - 1 - y, o] += (n - 1 - x) * scale   # left[y]
            W[c + n + 1, o] += (x + 1) * scale       # top-right
            W[c + 1 + x, o] += (n - 1 - y) * scale   # top[x]
            W[c - n - 1, o] += (y + 1) * scale       # bottom-left
    return W


def _dc_w(n):
    L = 4 * n + 1
    c = 2 * n
    log2 = int(np.log2(n))
    scale = 1 << (5 - log2)                          # 6 - (log2+1)
    W = np.zeros((L, n * n), np.int64)
    for k in range(n):
        W[c - 1 - k, :] += scale                     # left[k]
        W[c + 1 + k, :] += scale                     # top[k]
    return W


def build_wtab(log2):
    """(35*Lp, n*n) int8 weight table for one class; row block m*Lp.."""
    n = 1 << log2
    Lp = lpad(log2)
    out = np.zeros((35 * Lp, n * n), np.int8)
    for mode in range(35):
        if mode == 0:
            W = _planar_w(n)
        elif mode == 1:
            W = _dc_w(n)
        else:
            W = _angular_w(mode, n)
        assert W.min() >= 0 and W.max() <= 64, (mode, n, W.max())
        # every output's weights sum to exactly 64 (a constant border must
        # predict to itself) — so the int8-centered matvec bias is the
        # CONSTANT 32 + 128*64 = 8224 for every mode/output; no bias table
        assert (W.sum(0) == 64).all(), (mode, n)
        out[mode * Lp:mode * Lp + 4 * n + 1] = W.astype(np.int8)
    return out


_CACHE = {}


def wtab(log2):
    t = _CACHE.get(log2)
    if t is None:
        t = _CACHE[log2] = build_wtab(log2)
    return t


def place_mat(log2):
    """(n*n, n*128) 0/1 int8: MXU placement of the flat row-major block
    into n VMEM rows (block pixel (r,c) -> lane r*128+c). Lets the
    scatter be ONE dot + reshape + multi-row RMW instead of a per-row
    roll/blend loop (75% of kernel time in the ablation)."""
    key = ("P", log2)
    t = _CACHE.get(key)
    if t is None:
        n = 1 << log2
        P = np.zeros((n * n, n * 128), np.int8)
        idx = np.arange(n * n)
        P[idx, (idx // n) * 128 + (idx % n)] = 1
        t = _CACHE[key] = P
    return t


def colsel_mat(log2):
    """(n*n, n) 0/1 int8: selects block column 0 (res[r*n] -> lane r)
    for the DC/mode-26 boundary-column fixups."""
    key = ("S", log2)
    t = _CACHE.get(key)
    if t is None:
        n = 1 << log2
        S = np.zeros((n * n, n), np.int8)
        S[np.arange(n) * n, np.arange(n)] = 1
        t = _CACHE[key] = S
    return t


# ----------------------------------------------------------- numpy model
def predict_w(ref, mode, log2, luma, bitdepth=8):
    """Numpy oracle of the kernel's matvec+fixups for ONE TU. ref:
    (4n+1,) int substituted-and-FILTERED border in spec scan order.
    Returns (n,n). Used by tests to pin the kernel's decomposition
    against ops/intra_jax.predict_core."""
    n = 1 << log2
    c = 2 * n
    Lp = lpad(log2)
    W = wtab(log2)[mode * Lp:mode * Lp + 4 * n + 1].astype(np.int64)
    pred = ((ref.astype(np.int64) @ W + 32) >> 6).reshape(n, n)
    maxv = (1 << bitdepth) - 1
    top = ref[c + 1:c + 1 + n].astype(np.int64)
    left = ref[c - 1:c - 1 - n:-1].astype(np.int64)
    if mode == 1 and luma and n < 32:
        dc = (top.sum() + left.sum() + n) >> (log2 + 1)
        pred[0, :] = (top + 3 * dc + 2) >> 2
        pred[:, 0] = (left + 3 * dc + 2) >> 2
        pred[0, 0] = (left[0] + 2 * dc + top[0] + 2) >> 2
    if mode == 26 and luma and n < 32:
        pred[:, 0] = np.clip(top[0] + ((left - ref[c]) >> 1), 0, maxv)
    if mode == 10 and luma and n < 32:
        pred[0, :] = np.clip(left[0] + ((top - ref[c]) >> 1), 0, maxv)
    return pred
