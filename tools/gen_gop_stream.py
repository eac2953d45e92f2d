#!/usr/bin/env python3
"""Generate the long multi-IRAP 1080p stream for the GOP-parallel scaling
bench (tests/data/gop1080p.bin): 96 frames, IDR every 6 -> 16 independent
GOPs. Content/config matches the 4K bench class (gen_bench_stream.py);
dec265 produces the golden per-frame MD5s.

Usage: python tools/gen_gop_stream.py [n_frames] [intra_period]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
DEC = os.path.join(REPO, ".ref_build", "dec265", "dec265")
DATA = os.path.join(REPO, "tests", "data")

from libde265_tpu.encoder import Encoder, EncoderConfig  # noqa: E402
from gen_inter_streams import plane_md5s  # noqa: E402
from gen_bench_stream import make_frames  # noqa: E402


def main():
    nf = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    period = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    w, h = 1920, 1080
    cfg = EncoderConfig(width=w, height=h, qp=34, inter_mode="mv",
                        inter_residual=True, log2_ctb=6, cu_log2=4,
                        num_ref_l0=2, temporal_mvp=True,
                        disable_deblocking=False, sao=True,
                        intra_period=period)
    enc = Encoder(cfg)
    frames = make_frames(nf, w, h, seed=23)
    t0 = time.time()
    stream = enc.encode(frames)
    print(f"encoded {nf} frames in {time.time()-t0:.0f}s, "
          f"{len(stream)} bytes", flush=True)
    bit = os.path.join(DATA, "gop1080p.bin")
    open(bit, "wb").write(stream)
    gold = os.path.join(DATA, "gop1080p_gold.yuv")
    r = subprocess.run([DEC, "-q", "-o", gold, bit], capture_output=True,
                       text=True, timeout=3600)
    assert r.returncode == 0, r.stderr
    path = os.path.join(DATA, "manifest_big.json")
    manifest = json.load(open(path)) if os.path.exists(path) else {}
    manifest["gop1080p"] = {"w": w, "h": h, "frames": nf,
                            "md5": plane_md5s(gold, w, h, nf, 1),
                            "bit_depth": 8, "size_bytes": len(stream),
                            "intra_period": period}
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.remove(gold)
    print("gop1080p done")


if __name__ == "__main__":
    main()
