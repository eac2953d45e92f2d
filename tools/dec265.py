#!/usr/bin/env python3
"""dec265-equivalent CLI decoder (counterpart of /root/reference/dec265/dec265.cc).

Usage: python tools/dec265.py [options] stream.bin
  -o FILE     write decoded YUV (4:2:0 planar)
  -c          verify SEI decoded-picture-hash (fails on mismatch)
  -m FILE     compute PSNR against a reference YUV
  -n          use the native C++ front-end (default: auto if built)
  -q          quiet (no per-frame lines)
  --frames N  stop after N frames
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream")
    ap.add_argument("-o", "--output")
    ap.add_argument("-c", "--check-hash", action="store_true")
    ap.add_argument("-m", "--measure")
    ap.add_argument("-n", "--native", action="store_true", default=None)
    ap.add_argument("-q", "--quiet", action="store_true")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("-T", "--highest-tid", type=int, default=None,
                    help="decode only temporal sub-layers <= TID")
    ap.add_argument("-F", "--framerate-ratio", type=int, default=None,
                    help="decode only this percent of the frame rate "
                         "(drops highest temporal layers)")
    ap.add_argument("--disable-deblocking", action="store_true",
                    help="debug: skip the deblocking filter "
                         "(reference dec265.cc:598-609)")
    ap.add_argument("--disable-sao", action="store_true",
                    help="debug: skip the SAO filter")
    args = ap.parse_args()
    if args.disable_deblocking:
        os.environ["DE265_DISABLE_DEBLOCK"] = "1"
        args.native = False      # filter kill-switch lives in the
    if args.disable_sao:         # reference recon path
        os.environ["DE265_DISABLE_SAO"] = "1"
        args.native = False
    if (args.highest_tid is not None or args.framerate_ratio is not None):
        args.native = False  # temporal gating runs in the Python decoder

    data = open(args.stream, "rb").read()
    t0 = time.time()
    native_so = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "libhevc_frontend.so")
    use_native = args.native if args.native is not None else os.path.exists(native_so)

    hash_fail = 0
    if use_native:
        from libde265_tpu.api import decode_stream_native
        pics = decode_stream_native(data)
        if args.check_hash:
            # verify SEI hashes against decode-order frames
            from libde265_tpu.bitstream.nal import split_annexb
            from libde265_tpu.bitstream.sei import parse_sei, verify_picture_hash
            hashes = []
            for u in split_annexb(data):
                if u.header.nal_unit_type in (39, 40):
                    for m in parse_sei(u.data):
                        if m.picture_hash:
                            hashes.append(m.picture_hash)
            for pic, ph in zip(sorted(pics, key=lambda p: 0), hashes):
                pass  # hashes follow decode order == output order for our streams
            for pic, ph in zip(pics, hashes):
                if not verify_picture_hash(pic.planes, ph):
                    hash_fail += 1
    else:
        from libde265_tpu.decoder import Decoder
        from libde265_tpu.api import get_next_picture
        dec = Decoder()
        if args.highest_tid is not None:
            dec.set_limit_tid(args.highest_tid)
        if args.framerate_ratio is not None:
            dec.set_framerate_ratio(args.framerate_ratio)
        dec.push_data(data)
        dec.flush()
        pics = []
        while dec.decode():
            pass
        while True:
            p = get_next_picture(dec)
            if p is None:
                break
            pics.append(p)
        hash_fail = sum("MISMATCH" in w for w in dec.warnings)
    dt = time.time() - t0
    if args.frames:
        pics = pics[:args.frames]

    if args.output:
        with open(args.output, "wb") as f:
            for p in pics:
                f.write(p.to_yuv_bytes())
    if args.measure and pics:
        from libde265_tpu.utils.quality import psnr_yuv
        ref = open(args.measure, "rb").read()
        w, h = pics[0].width, pics[0].height
        fsz = w * h * 3 // 2
        for i, p in enumerate(pics):
            vals = psnr_yuv(p.planes, ref[i * fsz:(i + 1) * fsz], w, h)
            print(f"frame {i}: PSNR Y {vals[0]:.2f} U {vals[1]:.2f} V {vals[2]:.2f}")
    if args.check_hash and hash_fail:
        print(f"HASH MISMATCH on {hash_fail} frame(s)")
        return 1
    if not args.quiet or True:
        n = len(pics)
        dim = f"{pics[0].width}x{pics[0].height}" if pics else "?"
        print(f"nFrames decoded: {n} ({dim} @ {n/dt:.2f} fps)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
