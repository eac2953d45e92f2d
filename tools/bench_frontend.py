#!/usr/bin/env python3
"""Native front-end (bitstream->plans) throughput at realistic sizes.

The CABAC front-end is the serial stage of the decoder (SURVEY §7 "hard
parts"); this measures whether it can feed the device pipeline at the 4K
target (reference comparison: dec265 single-threaded FULL decode of the
same streams). FE_THREADS controls the frame-parallel worker pool.

Usage: python tools/bench_frontend.py [stream ...]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA = os.path.join(REPO, "tests", "data")
DEC = os.path.join(REPO, ".ref_build", "dec265", "dec265")

STREAMS = ["ld_720p_wpp", "ld_1080p_wpp", "tiles44_1080p", "ld4k"]


def main():
    from libde265_tpu.native_frontend import NativeFrontend
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.bitstream.paramsets import read_sps, read_pps
    names = sys.argv[1:] or STREAMS
    for name in names:
        path = os.path.join(DATA, name + ".bin")
        if not os.path.exists(path):
            print(json.dumps({"stream": name, "error": "absent"}))
            continue
        with open(path, "rb") as f:
            data = f.read()
        spss, ppss = {}, {}
        for u in split_annexb(data):
            t = u.header.nal_unit_type
            if t == 33:
                s = read_sps(u.data)
                spss[s.seq_parameter_set_id] = s
            elif t == 34:
                ppss[read_pps(u.data, spss).pic_parameter_set_id] = \
                    read_pps(u.data, spss)
        # warm (mmap, code paths), then time the parse alone
        fe = NativeFrontend()
        t0 = time.time()
        n = fe.lib.fe_push_stream(fe.h, data, len(data))
        t_parse = time.time() - t0
        # full plan extraction (grids+TUs+PUs into numpy) on a fresh FE
        fe2 = NativeFrontend()
        t0 = time.time()
        plans = fe2.parse(data, spss, ppss)
        t_full = time.time() - t0
        row = {"stream": name, "frames": int(n),
               "fe_parse_fps": round(n / t_parse, 1),
               "fe_plus_extract_fps": round(len(plans) / t_full, 1)}
        if os.path.exists(DEC):
            t0 = time.time()
            subprocess.run([DEC, "-q", path], capture_output=True,
                           timeout=600)
            row["dec265_1thread_full_decode_fps"] = \
                round(n / (time.time() - t0), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
