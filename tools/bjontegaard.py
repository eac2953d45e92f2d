#!/usr/bin/env python3
"""Bjontegaard-delta metric between two RD curves (counterpart of
/root/reference/tools/bjoentegaard.cc).

Usage: python tools/bjontegaard.py curve1.json curve2.json
where each JSON is a list of {"kbps": .., "psnr_y": ..} points
(e.g. the output of rd_curves.py).
"""
import json
import sys

import numpy as np


def bd_psnr(c1, c2):
    """BD-PSNR: average PSNR difference over the overlapping rate range."""
    r1 = np.log10([p["kbps"] for p in c1])
    p1 = [p["psnr_y"] for p in c1]
    r2 = np.log10([p["kbps"] for p in c2])
    p2 = [p["psnr_y"] for p in c2]
    f1 = np.polyfit(r1, p1, min(3, len(r1) - 1))
    f2 = np.polyfit(r2, p2, min(3, len(r2) - 1))
    lo = max(min(r1), min(r2))
    hi = min(max(r1), max(r2))
    x = np.linspace(lo, hi, 100)
    return float(np.mean(np.polyval(f2, x) - np.polyval(f1, x)))


def bd_rate(c1, c2):
    """BD-rate: average bitrate difference (%) at equal quality."""
    p1 = [p["psnr_y"] for p in c1]
    r1 = np.log10([p["kbps"] for p in c1])
    p2 = [p["psnr_y"] for p in c2]
    r2 = np.log10([p["kbps"] for p in c2])
    f1 = np.polyfit(p1, r1, min(3, len(p1) - 1))
    f2 = np.polyfit(p2, r2, min(3, len(p2) - 1))
    lo = max(min(p1), min(p2))
    hi = min(max(p1), max(p2))
    if hi <= lo:
        # curves do not overlap in quality: BD-rate undefined (one curve
        # dominates at every measured operating point)
        return float("nan")
    x = np.linspace(lo, hi, 100)
    diff = np.polyval(f2, x) - np.polyval(f1, x)
    return float((10 ** np.mean(diff) - 1) * 100)


def main():
    c1 = json.load(open(sys.argv[1]))
    c2 = json.load(open(sys.argv[2]))
    print(f"BD-PSNR: {bd_psnr(c1, c2):+.3f} dB")
    print(f"BD-rate: {bd_rate(c1, c2):+.2f} %")


if __name__ == "__main__":
    sys.exit(main())
