"""Coefficient scan orders (diagonal / horizontal / vertical) per spec 6.5.3-6.5.5.

Capability counterpart of /root/reference/libde265/scan.{h,cc}; generated
programmatically instead of stored as literal tables.
"""
from functools import lru_cache


@lru_cache(maxsize=None)
def diag_scan(w: int, h: int):
    """Up-right diagonal scan order (spec 6.5.3). Returns tuple of (x, y)."""
    out = []
    i, x, y = 0, 0, 0
    stop = False
    while not stop:
        while y >= 0:
            if x < w and y < h:
                out.append((x, y))
            y -= 1
            x += 1
        y = x
        x = 0
        if out and len(out) == w * h:
            stop = True
        if y >= h + w:
            stop = True
    return tuple(out)


@lru_cache(maxsize=None)
def horiz_scan(w: int, h: int):
    return tuple((x, y) for y in range(h) for x in range(w))


@lru_cache(maxsize=None)
def vert_scan(w: int, h: int):
    return tuple((x, y) for x in range(w) for y in range(h))


SCAN_DIAG, SCAN_HORIZ, SCAN_VERT = 0, 1, 2


@lru_cache(maxsize=None)
def get_scan_order(size: int, scan_idx: int):
    if scan_idx == SCAN_DIAG:
        return diag_scan(size, size)
    if scan_idx == SCAN_HORIZ:
        return horiz_scan(size, size)
    return vert_scan(size, size)


@lru_cache(maxsize=None)
def scan_pos_to_xy(size: int, scan_idx: int):
    """scan position -> (x,y) for a size x size block."""
    return get_scan_order(size, scan_idx)
