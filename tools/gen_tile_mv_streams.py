#!/usr/bin/env python3
"""Generate pure-inter tile-column vectors for the sharded (multi-chip)
decode path: P frames with mv+residual everywhere (fused-program
compatible), 2/4 uniform tile columns, loop-filter-across-tiles on and
off. dec265 golden MD5s appended to manifest_inter.json."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
DEC = os.path.join(REPO, ".ref_build", "dec265", "dec265")
DATA = os.path.join(REPO, "tests", "data")

from libde265_tpu.encoder import Encoder, EncoderConfig  # noqa: E402
from gen_inter_streams import make_frames, plane_md5s  # noqa: E402

CASES = [
    ("p_tiles2_mv", 256, 64, 4,
     dict(inter_mode="mv", inter_residual=True, tiles=(2, 1), log2_ctb=6,
          cu_log2=4, num_ref_l0=2, temporal_mvp=True,
          disable_deblocking=False, sao=True)),
    ("p_tiles2_mv_nolf", 256, 64, 4,
     dict(inter_mode="mv", inter_residual=True, tiles=(2, 1), log2_ctb=6,
          cu_log2=4, lf_across_tiles=False,
          disable_deblocking=False, sao=True)),
    ("p_tiles4_mv", 512, 128, 4,
     dict(inter_mode="mv", inter_residual=True, tiles=(4, 2), log2_ctb=6,
          cu_log2=4, num_ref_l0=2, temporal_mvp=True,
          disable_deblocking=False, sao=True)),
    ("p_tiles8_mv", 512, 64, 4,
     dict(inter_mode="mv", inter_residual=True, tiles=(8, 1), log2_ctb=6,
          cu_log2=4, num_ref_l0=2, temporal_mvp=True,
          disable_deblocking=False, sao=True)),
    # NON-uniform column widths (uniform_spacing=0, pps.h:109-151): the
    # sharded program pads strips to the widest column
    ("p_tiles8nu_mv", 704, 64, 4,
     dict(inter_mode="mv", inter_residual=True, tiles=(8, 1), log2_ctb=6,
          tile_col_widths=(1, 2, 1, 2, 1, 2, 1, 1),
          cu_log2=4, num_ref_l0=2, temporal_mvp=True,
          disable_deblocking=False, sao=True)),
    # uniform-SPACING grid whose width is NOT a column multiple: the
    # spec's ceil distribution yields 2/2/1-CTB columns (pps.h colBd)
    ("p_tiles3r_mv", 320, 64, 4,
     dict(inter_mode="mv", inter_residual=True, tiles=(3, 1), log2_ctb=6,
          cu_log2=4, num_ref_l0=2, temporal_mvp=True,
          disable_deblocking=False, sao=True)),
]


def main():
    path = os.path.join(DATA, "manifest_inter.json")
    manifest = json.load(open(path))
    only = set(sys.argv[1:])
    for name, w, h, nf, kw in CASES:
        if only and name not in only:
            continue
        cfg = EncoderConfig(width=w, height=h, qp=30, **kw)
        stream = Encoder(cfg).encode(make_frames(nf, w, h))
        bit = os.path.join(DATA, f"{name}.bin")
        gold = os.path.join(DATA, f"{name}_gold.yuv")
        open(bit, "wb").write(stream)
        r = subprocess.run([DEC, "-q", "-o", gold, bit], capture_output=True,
                           text=True, timeout=300)
        assert r.returncode == 0, (name, r.stderr)
        manifest[name] = {"w": w, "h": h, "frames": nf,
                          "md5": plane_md5s(gold, w, h, nf, 1),
                          "bit_depth": 8, "size_bytes": len(stream)}
        os.remove(gold)
        print(f"{name}: {len(stream)} bytes", flush=True)
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
