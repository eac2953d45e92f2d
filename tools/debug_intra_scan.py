#!/usr/bin/env python3
"""Compare intra_stage (fori) vs intra_stage_scan (Pallas interpret) on
one frame; report differing pixels / TUs. Usage:
  JAX_PLATFORMS=cpu DE265_INTRA_SCAN=force python tools/debug_intra_scan.py [stream] [frame]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("DE265_INTRA_SCAN", "force")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")   # axon ignores JAX_PLATFORMS
import jax.numpy as jnp

from libde265_tpu.native_frontend import NativeFrontend
from libde265_tpu.bitstream.nal import split_annexb
from libde265_tpu.bitstream.paramsets import read_sps, read_pps
from libde265_tpu.frame_program import (stream_cfg, pack_frame,
                                        frame_has_intra, frame_compatible)
from libde265_tpu import intra_fused

name = sys.argv[1] if len(sys.argv) > 1 else "intra_cif_q30"
fno = int(sys.argv[2]) if len(sys.argv) > 2 else 0
path = os.path.join(REPO, "tests", "data", name + ".bin")
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
plans = NativeFrontend().parse(data, spss, ppss)
frames = [p for p in plans if p.nal_type != -1]
plan = [p for p in frames if frame_has_intra(p) and frame_compatible(p)][fno]
cfg = stream_cfg(plans, plans[0].sps)
assert cfg.intra_scan, "set DE265_INTRA_SCAN=force"
print("cfg.intra:", cfg.intra, "intra_scan:", cfg.intra_scan)

t = intra_fused.pack_intra(plan, cfg)
tj = {k: jnp.asarray(v) for k, v in t.items()}

H, W = cfg.H, cfg.W
rng = np.random.RandomState(0)
# synthetic starting planes (mid-grey + noise in non-intra areas is fine:
# intra TUs overwrite; their borders read whatever is there, and both
# paths read the SAME planes)
Y0 = rng.randint(0, 256, (H, W)).astype(np.int32)
Cb0 = rng.randint(0, 256, (H // 2, W // 2)).astype(np.int32)
Cr0 = rng.randint(0, 256, (H // 2, W // 2)).astype(np.int32)

import dataclasses
cfg_fori = dataclasses.replace(cfg, intra_scan=())
Yf, Cbf, Crf = (np.asarray(v) for v in intra_fused.intra_stage(
    jnp.asarray(Y0), jnp.asarray(Cb0), jnp.asarray(Cr0), tj, cfg_fori))
Ys, Cbs, Crs = (np.asarray(v) for v in intra_fused.intra_stage(
    jnp.asarray(Y0), jnp.asarray(Cb0), jnp.asarray(Cr0), tj, cfg))

for nm, a, b in (("Y", Yf, Ys), ("Cb", Cbf, Cbs), ("Cr", Crf, Crs)):
    d = a != b
    print(f"{nm}: {int(d.sum())} / {d.size} pixels differ")
    if d.any():
        ys, xs = np.nonzero(d)
        print(f"  bbox y [{ys.min()},{ys.max()}] x [{xs.min()},{xs.max()}]")
        # first few differing 4x4 blocks
        blocks = sorted(set(zip((ys // 4 * 4).tolist(),
                                (xs // 4 * 4).tolist())))[:12]
        print("  first blocks:", blocks)
        y0, x0 = blocks[0]
        print("  fori:\n", a[y0:y0 + 4, x0:x0 + 4])
        print("  scan:\n", b[y0:y0 + 4, x0:x0 + 4])
# first differing TU in KERNEL SCAN ORDER (its borders were correct if
# every earlier TU matched)
tm = plan._tu_arrays[0]
lv = intra_fused.assign_levels_meta(plan)
if (Yf != Ys).any():
    lcls = [e[1] for e in cfg.intra if e[0] == 0]
    perm = t["ispm_0"]
    shown = 0
    for slot, pv in enumerate(perm):
        if pv < 0:
            continue
        rank, row = int(pv) & 3, int(pv) >> 2
        log2 = lcls[rank]
        n = 1 << log2
        sfx = f"_0_{log2}"
        x, y = (int(v) for v in t["ixy" + sfx][row])
        mode = int(t["imd" + sfx][row])
        blkdiff = (Yf[y:y + n, x:x + n] != Ys[y:y + n, x:x + n])
        if blkdiff.any():
            print(f"slot {slot} (band {slot // cfg.intra_scan[0]}) "
                  f"TU x={x} y={y} n={n} mode={mode} "
                  f"ok={np.unpackbits(t['iok' + sfx][row])[:4 * n + 1]}")
            print(" fori:\n", Yf[y:y + n, x:x + n][:6, :8])
            print(" scan:\n", Ys[y:y + n, x:x + n][:6, :8])
            shown += 1
            if shown >= 3:
                break
