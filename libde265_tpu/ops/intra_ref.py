"""Intra prediction reference implementation (spec 8.4.4.2) — numpy, bit-exact.

Capability counterpart of /root/reference/libde265/intrapred.cc (border
gathering lives in reconstruct.py since it needs frame metadata; this module
takes an already-substituted border array).

Border layout: a 1-D int array `ref` of length 4N+1, centre at index 2N:
  ref[2N]         = corner p[-1][-1]
  ref[2N + k]     = top row p[k-1][-1],  k = 1..2N
  ref[2N - k]     = left column p[-1][k-1], k = 1..2N
"""
import numpy as np

# intraPredAngle for modes 2..34 (spec Table 8-5)
INTRA_PRED_ANGLE = (
    32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21, -26, -32,
    -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13, 17, 21, 26, 32,
)
# invAngle for modes 11..25 (spec Table 8-6)
INV_ANGLE = (
    -4096, -1638, -910, -630, -482, -390, -315, -256,
    -315, -390, -482, -630, -910, -1638, -4096,
)


def filter_border(ref: np.ndarray, n: int, mode: int, cidx: int, bitdepth: int,
                  strong_smoothing: bool, c444: bool = False) -> np.ndarray:
    """spec 8.4.4.2.3 reference sample filtering. ref length 4N+1.
    c444: ChromaArrayType==3 extends sample filtering to chroma
    (intrapred.cc:1085-1089); strong smoothing stays luma-only."""
    if (cidx != 0 and not c444) or n == 4 or mode == 1:
        return ref
    # planar (mode 0) yields minDist = 10 and is filtered for n >= 8
    min_dist = min(abs(mode - 26), abs(mode - 10))
    thresh = {8: 7, 16: 1, 32: 0}.get(n, 10)
    if min_dist <= thresh:
        return ref
    c = 2 * n
    out = ref.copy()
    bi_thresh = 1 << (bitdepth - 5)
    if strong_smoothing and n == 32 and cidx == 0 and \
            abs(int(ref[c]) + int(ref[c + 2 * n]) - 2 * int(ref[c + n])) < bi_thresh and \
            abs(int(ref[c]) + int(ref[c - 2 * n]) - 2 * int(ref[c - n])) < bi_thresh:
        # strong (bilinear) smoothing, 8.4.4.2.3 eq 8-30..8-34
        corner = int(ref[c])
        top_end = int(ref[c + 2 * n])
        left_end = int(ref[c - 2 * n])
        for i in range(1, 2 * n):
            out[c + i] = ((2 * n - i) * corner + i * top_end + n) >> 6
            out[c - i] = ((2 * n - i) * corner + i * left_end + n) >> 6
        return out
    # [1 2 1] filter
    src = ref.astype(np.int32)
    out = ref.copy()
    out[c] = (src[c - 1] + 2 * src[c] + src[c + 1] + 2) >> 2
    for i in range(1, 2 * n):
        out[c + i] = (src[c + i - 1] + 2 * src[c + i] + src[c + i + 1] + 2) >> 2
        out[c - i] = (src[c - i + 1] + 2 * src[c - i] + src[c - i - 1] + 2) >> 2
    # ends unfiltered
    return out


def predict(ref: np.ndarray, mode: int, log2: int, cidx: int,
            bitdepth: int = 8, disable_boundary_filter: bool = False) -> np.ndarray:
    """Returns the (N,N) intra prediction, int32 in pixel range."""
    n = 1 << log2
    c = 2 * n
    r = ref.astype(np.int32)
    if mode == 0:
        return _planar(r, c, n, log2)
    if mode == 1:
        return _dc(r, c, n, log2, cidx, bitdepth, disable_boundary_filter)
    return _angular(r, c, n, mode, cidx, bitdepth, disable_boundary_filter)


def _planar(r, c, n, log2):
    left = r[np.arange(c - 1, c - 1 - n, -1)]   # p[-1][y], y=0..n-1
    top = r[c + 1:c + 1 + n]                    # p[x][-1]
    tr = int(r[c + n + 1])                      # p[N][-1]
    bl = int(r[c - n - 1])                      # p[-1][N]
    x = np.arange(n)
    y = np.arange(n)[:, None]
    # spec 8.4.4.2.4:
    pred = ((n - 1 - x)[None, :] * left[:, None]
            + (x + 1)[None, :] * tr
            + (n - 1 - y) * top[None, :]
            + (y + 1) * bl
            + n) >> (log2 + 1)
    return pred.astype(np.int32)


def _dc(r, c, n, log2, cidx, bitdepth, disable_bf):
    top = r[c + 1:c + 1 + n]
    left = r[np.arange(c - 1, c - 1 - n, -1)]
    dc = (int(top.sum()) + int(left.sum()) + n) >> (log2 + 1)
    pred = np.full((n, n), dc, np.int32)
    if cidx == 0 and n < 32 and not disable_bf:
        pred[0, :] = (top + 3 * dc + 2) >> 2
        pred[:, 0] = (left + 3 * dc + 2) >> 2
        pred[0, 0] = (int(left[0]) + 2 * dc + int(top[0]) + 2) >> 2
    return pred


def _angular(r, c, n, mode, cidx, bitdepth, disable_bf):
    angle = INTRA_PRED_ANGLE[mode - 2]
    pred = np.zeros((n, n), np.int32)
    if mode >= 18:
        # vertical-ish: reference is the top row (+ projected left for angle<0)
        refbuf = np.zeros(3 * n + 2, np.int32)  # refbuf[n + i] = ref[i], i=-n..2n (+1 slack)
        refbuf[n:3 * n + 1] = r[c:c + 2 * n + 1]
        if angle < 0:
            inv = INV_ANGLE[mode - 11]
            last = (n * angle) >> 5
            # ref[last] itself is never read (min access is last+1): exclusive
            for i in range(-1, last, -1):
                refbuf[n + i] = r[c - ((i * inv + 128) >> 8)]
        y = np.arange(1, n + 1)[:, None]
        pos = y * angle
        idx = (pos >> 5)
        fact = pos & 31
        xx = np.arange(n)[None, :]
        a = refbuf[n + xx + idx + 1]
        b = refbuf[n + xx + idx + 2]
        pred = ((32 - fact) * a + fact * b + 16) >> 5
        if mode == 26 and cidx == 0 and n < 32 and not disable_bf:
            left = r[np.arange(c - 1, c - 1 - n, -1)]
            corner = int(r[c])
            col = r[c + 1] + ((left - corner) >> 1)
            pred[:, 0] = np.clip(col, 0, (1 << bitdepth) - 1)
    else:
        # horizontal-ish: mirror roles of x and y using left references
        refbuf = np.zeros(3 * n + 2, np.int32)
        refbuf[n:3 * n + 1] = r[np.arange(c, c - 2 * n - 1, -1)]  # left column as "row"
        if angle < 0:
            inv = INV_ANGLE[mode - 11]
            last = (n * angle) >> 5
            for i in range(-1, last, -1):
                refbuf[n + i] = r[c + ((i * inv + 128) >> 8)]
        x = np.arange(1, n + 1)[:, None]
        pos = x * angle
        idx = pos >> 5
        fact = pos & 31
        yy = np.arange(n)[None, :]
        a = refbuf[n + yy + idx + 1]
        b = refbuf[n + yy + idx + 2]
        predT = ((32 - fact) * a + fact * b + 16) >> 5
        pred = predT.T.copy()
        if mode == 10 and cidx == 0 and n < 32 and not disable_bf:
            top = r[c + 1:c + 1 + n]
            corner = int(r[c])
            row = r[c - 1] + ((top - corner) >> 1)
            pred[0, :] = np.clip(row, 0, (1 << bitdepth) - 1)
    return pred.astype(np.int32)
