#!/usr/bin/env python3
"""Generate chroma-format range-extension golden vectors (monochrome,
4:2:2, 4:4:4 — intra-only) with our encoder and record per-plane MD5s of
the reference decoder's output (.ref_build/dec265) as the oracle,
mirroring tools/gen_streams.py. Writes tests/data/rext_*.bin +
tests/data/manifest_rext.json.

Reference format support: sps.cc:220-232 (chroma_format_idc parse),
slice.cc:3567-3790 (per-format transform unit).
"""
import hashlib
import zlib
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA = os.path.join(REPO, "tests", "data")
DEC265 = os.path.join(REPO, ".ref_build", "dec265", "dec265")

from libde265_tpu.encoder.encoder import Encoder, EncoderConfig   # noqa: E402

CASES = [
    # name, chroma_format, W, H, qp, bit_depth, frames, nxn
    ("rext_mono_104x72", 0, 104, 72, 26, 8, 2, False),
    ("rext_422_104x72", 2, 104, 72, 30, 8, 3, False),
    ("rext_444_104x72", 3, 104, 72, 28, 8, 3, False),
    ("rext_422_10bit", 2, 64, 64, 30, 10, 2, False),
    ("rext_444_10bit", 3, 64, 64, 30, 10, 2, False),
    ("rext_mono_10bit", 0, 64, 64, 30, 10, 1, False),
    # PART_NxN + forced TT split: blk3 chroma aggregation, 4:2:2
    # dual-cbf-at-split, 4:4:4 per-leaf cbf + per-PB chroma modes
    ("rext_420_nxn", 1, 64, 64, 30, 8, 2, True),
    ("rext_422_nxn", 2, 64, 64, 30, 8, 2, True),
    ("rext_444_nxn", 3, 64, 64, 30, 8, 2, True),
]

# inter cases: (name, cf, W, H, qp, bd, frames, inter_mode) — fractional
# qpel MVs exercise the format-scaled epel phases (motion.cc:190-191)
INTER_CASES = [
    ("rext_mono_inter", 0, 64, 64, 30, 8, 4, "mixed"),
    ("rext_420_inter_12b", 1, 64, 64, 30, 12, 3, "mv"),
    ("rext_444_inter_12b", 3, 64, 64, 30, 12, 3, "mv"),
    ("rext_422_inter", 2, 64, 64, 30, 8, 4, "mv"),
    ("rext_444_inter", 3, 64, 64, 30, 8, 4, "mv"),
    ("rext_422_inter_10b", 2, 64, 64, 30, 10, 3, "mixed"),
    ("rext_444_inter_10b", 3, 64, 64, 30, 10, 3, "gmv"),
]

# in-loop filters on: per-format deblock chroma geometry
# (deblock.cc:738-757) + per-axis SAO (sao.cc:303-304)
FILTER_CASES = [
    ("rext_422_filters", 2, 64, 64, 30, 8, 3, "mv"),
    ("rext_444_filters", 3, 64, 64, 30, 8, 3, "mv"),
    ("rext_mono_filters", 0, 64, 64, 30, 8, 3, "mixed"),
]

# raw PCM CUs with format-sized chroma sample blocks (7.3.8.7)
PCM_CASES = [
    ("rext_mono_pcm", 0), ("rext_422_pcm", 2), ("rext_444_pcm", 3),
]


def gen_frames(cf, W, H, bd, n, seed):
    rng = np.random.RandomState(seed)
    mx = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16

    def smooth(h, w):
        a = rng.randint(0, mx + 1, (h // 8 + 2, w // 8 + 2)).astype(np.float32)
        a = np.kron(a, np.ones((8, 8), np.float32))[:h, :w]
        return np.clip(a + rng.randint(-9, 10, (h, w)), 0, mx).astype(dt)

    sw = 2 if cf in (1, 2) else 1
    sh = 2 if cf == 1 else 1
    cw, ch = (W // sw, H // sh) if cf else (0, 0)
    out = []
    for _ in range(n):
        planes = [smooth(H, W)]
        planes += [smooth(ch, cw), smooth(ch, cw)] if cf else \
            [np.zeros((0, 0), dt)] * 2
        out.append(planes)
    return out


def main():
    manifest = {}
    all_cases = [c + (None, False, False) for c in CASES] + \
        [(n_, cf, W, H, qp, bd, nf, False, im, False, False)
         for (n_, cf, W, H, qp, bd, nf, im) in INTER_CASES] + \
        [(n_, cf, W, H, qp, bd, nf, False, im, True, False)
         for (n_, cf, W, H, qp, bd, nf, im) in FILTER_CASES] + \
        [(n_, cf, 64, 64, 30, 8, 1, False, None, False, True)
         for (n_, cf) in PCM_CASES]
    for name, cf, W, H, qp, bd, n, nxn, im, filt, pcm in all_cases:
        if im is None:
            cfg = EncoderConfig(width=W, height=H, qp=qp, chroma_format=cf,
                                bit_depth=bd, intra_period=1, pcm=pcm,
                                cu_log2=3 if nxn else 4, nxn_intra=nxn)
        else:
            cfg = EncoderConfig(width=W, height=H, qp=qp, chroma_format=cf,
                                bit_depth=bd, inter_mode=im,
                                inter_residual=True, num_ref_l0=2,
                                temporal_mvp=True,
                                disable_deblocking=not filt, sao=filt,
                                global_mv=(9, -6), mv_jitter=3)
        enc = Encoder(cfg)
        data = enc.encode(gen_frames(cf, W, H, bd, n,
                             zlib.crc32(name.encode()) & 0xffff))
        path = os.path.join(DATA, name + ".bin")
        with open(path, "wb") as f:
            f.write(data)
        yuv = os.path.join(DATA, name + ".yuv.tmp")
        subprocess.run([DEC265, "-q", "-o", yuv, path], check=True,
                       capture_output=True, timeout=300)
        raw = np.fromfile(yuv, np.uint8)
        os.remove(yuv)
        # split per frame / plane
        esz = 1 if bd == 8 else 2
        sw = 2 if cf in (1, 2) else 1
        sh = 2 if cf == 1 else 1
        ys = W * H * esz
        cs = (W // sw) * (H // sh) * esz if cf else 0
        fsz = ys + 2 * cs
        assert raw.size == fsz * n, (raw.size, fsz, n)
        md5s = []
        for i in range(n):
            base = i * fsz
            rec = {"y": hashlib.md5(raw[base:base + ys].tobytes()).hexdigest()}
            if cf:
                rec["u"] = hashlib.md5(
                    raw[base + ys:base + ys + cs].tobytes()).hexdigest()
                rec["v"] = hashlib.md5(
                    raw[base + ys + cs:base + fsz].tobytes()).hexdigest()
            md5s.append(rec)
        manifest[name] = {"w": W, "h": H, "chroma_format": cf,
                          "bit_depth": bd, "frames": n, "md5": md5s}
        print(f"{name}: {len(data)} bytes, {n} frames")
    with open(os.path.join(DATA, "manifest_rext.json"), "w") as f:
        json.dump(manifest, f, indent=1)


if __name__ == "__main__":
    main()
