#!/usr/bin/env python3
"""Real-TPU harness for the Pallas intra band-scan kernel: decode the
ld4k_light IDR through decode_frame_device with cfg.intra_scan on,
verify the per-plane MD5s against the dec265 goldens, and time the
I-frame (compare: ~283 ms on the fori wavefront path).
  python tools/bench_intra_scan.py [stream] [--fori]
"""
import json
import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

stream = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
    "--") else "ld4k_light"
use_fori = "--fori" in sys.argv
if use_fori:
    os.environ["DE265_INTRA_SCAN"] = "0"

import jax
import jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
except Exception:
    pass

import bench
from dataclasses import replace
from libde265_tpu.frame_program import (stream_cfg, pack_frame,
                                        frame_has_intra, init_tables,
                                        decode_frame_device, REF_SLOTS)

DATA = os.path.join(REPO, "tests", "data")
with open(os.path.join(DATA, stream + ".bin"), "rb") as f:
    data = f.read()
mfn = "manifest_big.json"
with open(os.path.join(DATA, mfn)) as f:
    man = json.load(f)[stream]
W, H = man["w"], man["h"]

t0 = time.time()
plans = bench.parse_stream(data)
print(f"# parsed {len(plans)} in {time.time()-t0:.1f}s", flush=True)
on_tpu = jax.default_backend() not in ("cpu",)
cfg = stream_cfg(plans, plans[0].sps, use_pallas=on_tpu)
print(f"# intra_scan={cfg.intra_scan} backend={jax.default_backend()}",
      flush=True)
iframes = [p for p in plans if p.nal_type != -1 and frame_has_intra(p)]
plan = iframes[0]
cfg_i = replace(cfg, skip_mc=True)
t0 = time.time()
t = pack_frame(plan, cfg_i, {plan.frame_id: 0}, real_slots=True)
print(f"# packed in {time.time()-t0:.2f}s", flush=True)

dy = jnp.zeros((REF_SLOTS, H, W), jnp.int16)
dcb = jnp.zeros((REF_SLOTS, H // 2, W // 2), jnp.int16)
dcr = jnp.zeros((REF_SLOTS, H // 2, W // 2), jnp.int16)
ty, tc = init_tables(cfg)
tj = {k: jax.device_put(v) for k, v in t.items()}

f = jax.jit(decode_frame_device, static_argnames=("cfg", "stages"))
t0 = time.time()
dy, dcb, dcr, ty, tc = f(dy, dcb, dcr, ty, tc, tj, 0, cfg=cfg_i)
got = [hashlib.md5(np.asarray(pl[0]).astype(np.uint8).tobytes())
       .hexdigest() for pl in (dy, dcb, dcr)]
print(f"# first run (compile incl): {time.time()-t0:.1f}s", flush=True)
want = [man["md5"][plan.poc][k] for k in ("y", "u", "v")]
print("MD5", "MATCH" if got == want else f"MISMATCH {got} != {want}",
      flush=True)

R = 10
t0 = time.time()
for _ in range(R):
    dy, dcb, dcr, ty, tc = f(dy, dcb, dcr, ty, tc, tj, 0, cfg=cfg_i)
float(dy[0, 0, 0])
dt = (time.time() - t0) / R
print(f"I-frame device time: {dt*1000:.1f} ms "
      f"({'fori' if use_fori else 'scan'})", flush=True)

if "--stages" in sys.argv:
    allst = ("mc", "res", "intra", "dbk", "sao", "tables")
    for drop in ("intra", "dbk", "sao", "tables", "res"):
        st = tuple(s for s in allst if s != drop)
        dy, dcb, dcr, ty, tc = f(dy, dcb, dcr, ty, tc, tj, 0, cfg=cfg_i,
                                 stages=st)
        float(dy[0, 0, 0])
        t0 = time.time()
        for _ in range(R):
            dy, dcb, dcr, ty, tc = f(dy, dcb, dcr, ty, tc, tj, 0,
                                     cfg=cfg_i, stages=st)
        float(dy[0, 0, 0])
        d2 = (time.time() - t0) / R
        print(f"  without {drop:7s}: {d2*1000:7.1f} ms  "
              f"(stage ~{(dt-d2)*1000:6.1f} ms)", flush=True)
