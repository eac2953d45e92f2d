#!/usr/bin/env python3
"""Golden vectors for the range-extension RESIDUAL TOOLS (round 5):
cross-component prediction, explicit & implicit RDPCM, transform-skip
rotation, transform-skip contexts, persistent Rice adaptation, disabled
intra smoothing, and TU-level chroma QP offset lists — isolated and in
deliberately awkward combinations. Encoded with our encoder (hash-SEI
closed loop), verified by dec265 (-c must pass with zero warnings), and
recorded in tests/data/manifest_rext_tools.json with per-plane MD5s of
dec265's output.

Reference semantics: /root/reference/libde265/slice.cc:2937-2951 (explicit
rdpcm syntax), 3330-3376 (persistent Rice), 3530-3558 (cross-comp syntax),
3610-3635 (chroma QP offsets), transform.cc:235-251 (cross-comp recon),
395-429 + 549-560 (rotation / rdpcm recon), fallback-dct.cc:185-258.

NOTE dec265 leaves StatCoeff uninitialized across dependent-slice/WPP
thread contexts (decctx.cc:57-90 ctor is commented out), so persistent-
Rice vectors stay single-slice — the reference's behaviour there is
undefined and cannot serve as an oracle.

Usage: python tools/gen_rext_tool_streams.py
"""
import hashlib
import json
import os
import subprocess
import sys
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
DATA = os.path.join(REPO, "tests", "data")
DEC265 = os.path.join(REPO, ".ref_build", "dec265", "dec265")

from libde265_tpu.encoder import Encoder, EncoderConfig   # noqa: E402
from gen_rext_streams import gen_frames                   # noqa: E402

# name -> (W, H, frames, EncoderConfig kwargs)
CASES = {
    # isolated tools
    "rxt_tsctx": (64, 64, 3, dict(
        transform_skip=True, transform_skip_context=True,
        sign_data_hiding=True)),
    "rxt_rice": (96, 64, 4, dict(
        transform_skip=True, persistent_rice=True, qp=24)),
    "rxt_rot": (64, 64, 3, dict(
        transform_skip=True, tskip_rotation=True)),
    "rxt_irdpcm": (64, 64, 3, dict(
        transform_skip=True, implicit_rdpcm=True,
        intra_modes=(10, 26, 0, 1, 10, 26, 34, 2))),
    "rxt_erdpcm": (64, 64, 4, dict(
        tq_bypass=True, explicit_rdpcm=True)),
    "rxt_smooth_off": (64, 64, 3, dict(intra_smoothing_disabled=True)),
    "rxt_ccp_444": (64, 64, 4, dict(
        chroma_format=3, cross_comp_pred=True, sao=True,
        disable_deblocking=False)),
    "rxt_cqo": (96, 64, 4, dict(
        chroma_qp_offset_list=((3, -3), (-5, 5)), sao=True,
        disable_deblocking=False)),
    # combinations
    "rxt_kitchen": (96, 64, 4, dict(
        transform_skip=True, tskip_rotation=True, implicit_rdpcm=True,
        transform_skip_context=True, persistent_rice=True,
        intra_smoothing_disabled=True,
        intra_modes=(10, 26, 0, 18, 10, 26, 34, 1), qp=27)),
    "rxt_ccp_rot_444": (64, 64, 3, dict(
        chroma_format=3, cross_comp_pred=True, transform_skip=True,
        tskip_rotation=True, implicit_rdpcm=True,
        intra_modes=(10, 26, 1, 0, 10, 26, 23, 34))),
    "rxt_erdpcm_rot_tsctx": (64, 64, 4, dict(
        tq_bypass=True, explicit_rdpcm=True, transform_skip=True,
        tskip_rotation=True, transform_skip_context=True)),
    "rxt_cqo_10b": (64, 64, 3, dict(
        bit_depth=10, chroma_qp_offset_list=((6, -6),),
        transform_skip=True)),
    "rxt_rice_scaling_10b": (64, 64, 3, dict(
        bit_depth=10, persistent_rice=True, transform_skip=True,
        scaling_lists=True, qp=24)),
    "rxt_ccp_cqo_444": (64, 64, 3, dict(
        chroma_format=3, cross_comp_pred=True,
        chroma_qp_offset_list=((4, -4), (-2, 2)))),
}


def main():
    if not os.path.exists(DEC265):
        sys.exit("build the reference first (see .claude/skills/verify)")
    manifest = {}
    for name, (W, H, nf, kw) in CASES.items():
        kw.setdefault("qp", 30)
        kw.setdefault("inter_mode", "mixed")
        kw.setdefault("inter_residual", True)
        kw.setdefault("log2_ctb", 5)
        kw.setdefault("cu_log2", 4)
        cfg = EncoderConfig(width=W, height=H, write_hash_sei=True, **kw)
        enc = Encoder(cfg)
        frames = gen_frames(cfg.chroma_format, W, H, cfg.bit_depth, nf,
                            zlib.crc32(name.encode()) & 0xffff)
        data = enc.encode(frames)
        path = os.path.join(DATA, name + ".bin")
        with open(path, "wb") as f:
            f.write(data)
        # oracle: dec265 -c must verify our hash SEI with zero warnings
        r = subprocess.run([DEC265, "-q", "-c", path],
                           capture_output=True, text=True, timeout=300)
        t = r.stdout + r.stderr
        assert r.returncode == 0 and "mismatch" not in t \
            and "WARNING" not in t, (name, t[-300:])
        yuv = os.path.join("/tmp", name + ".yuv")
        subprocess.run([DEC265, "-q", "-o", yuv, path], check=True,
                       capture_output=True, timeout=300)
        raw = np.fromfile(yuv, np.uint8)
        os.remove(yuv)
        cf, bd = cfg.chroma_format, cfg.bit_depth
        esz = 1 if bd == 8 else 2
        sw = 2 if cf in (1, 2) else 1
        sh = 2 if cf == 1 else 1
        ys = W * H * esz
        cs = (W // sw) * (H // sh) * esz if cf else 0
        fsz = ys + 2 * cs
        assert raw.size == fsz * nf, (name, raw.size, fsz, nf)
        md5s = []
        for i in range(nf):
            b = i * fsz
            rec = {"y": hashlib.md5(raw[b:b + ys].tobytes()).hexdigest()}
            if cf:
                rec["u"] = hashlib.md5(
                    raw[b + ys:b + ys + cs].tobytes()).hexdigest()
                rec["v"] = hashlib.md5(
                    raw[b + ys + cs:b + fsz].tobytes()).hexdigest()
            md5s.append(rec)
        manifest[name] = {"w": W, "h": H, "chroma_format": cf,
                          "bit_depth": bd, "frames": nf,
                          "size_bytes": len(data), "md5": md5s}
        print(f"{name}: {nf} frames, {len(data)} B, dec265-verified")
    with open(os.path.join(DATA, "manifest_rext_tools.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"\n{len(manifest)} vectors written")


if __name__ == "__main__":
    main()
