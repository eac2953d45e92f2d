#!/usr/bin/env python3
"""enc265-equivalent CLI encoder (counterpart of /root/reference/enc265).

Usage: python tools/enc265.py -i in.yuv -o out.bin -w W -h H -f N [options]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--help", action="help")
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", default="out.bin")
    ap.add_argument("-w", "--width", type=int, required=True)
    ap.add_argument("-h", "--height", type=int, required=True)
    ap.add_argument("-f", "--frames", type=int, default=0)
    ap.add_argument("--sop-structure", choices=["intra", "low-delay"],
                    default="low-delay")
    ap.add_argument("--cu-size", type=int, choices=[8, 16, 32], default=16)
    ap.add_argument("--deblock", action="store_true")
    # every registered encoder option becomes a CLI flag automatically
    # (counterpart of configparam.h auto-getopt / en265 -p options)
    from libde265_tpu.utils.configparam import encoder_parameters
    params = encoder_parameters()
    params.add_to_argparser(ap)
    args = ap.parse_args()

    from libde265_tpu.encoder import Encoder, EncoderConfig
    w, h = args.width, args.height
    fsz = w * h * 3 // 2
    raw = open(args.input, "rb").read()
    nf = len(raw) // fsz
    if args.frames:
        nf = min(nf, args.frames)
    frames = []
    for t in range(nf):
        b = t * fsz
        frames.append([
            np.frombuffer(raw[b:b + w * h], np.uint8).reshape(h, w),
            np.frombuffer(raw[b + w * h:b + w * h + (w // 2) * (h // 2)],
                          np.uint8).reshape(h // 2, w // 2),
            np.frombuffer(raw[b + w * h + (w // 2) * (h // 2):b + fsz],
                          np.uint8).reshape(h // 2, w // 2)])
    cfg = EncoderConfig(
        width=w, height=h,
        intra_period=1 if args.sop_structure == "intra" else 0,
        inter_residual=True,
        cu_log2={8: 3, 16: 4, 32: 5}[args.cu_size],
        disable_deblocking=not args.deblock)
    params.apply_args(cfg, args)        # user-set registry options win
    enc = Encoder(cfg)
    stream = enc.encode(frames)
    open(args.output, "wb").write(stream)
    print(f"encoded {nf} frames -> {len(stream)} bytes")


if __name__ == "__main__":
    sys.exit(main())
