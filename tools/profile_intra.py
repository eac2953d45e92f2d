#!/usr/bin/env python3
"""Profile the fused intra wavefront scan (intra_fused.intra_stage) on
the current backend: full cost, per-level-count scaling, per-class
ablations. Usage: python tools/profile_intra.py [stream] [poc]."""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from bench import parse_stream
    from libde265_tpu.frame_program import (stream_cfg, pack_frame,
                                            frame_has_intra)
    from libde265_tpu.intra_fused import intra_stage, intra_frame_stats

    stream = sys.argv[1] if len(sys.argv) > 1 else "ld4k_light"
    data = open(os.path.join(REPO, "tests", "data", stream + ".bin"),
                "rb").read()
    plans = parse_stream(data)
    t0 = time.time()
    cfg = stream_cfg(plans, plans[0].sps)
    print(f"stream_cfg: {time.time()-t0:.2f}s")
    plan = next(p for p in plans if frame_has_intra(p))
    nlv, st = intra_frame_stats(plan)
    print(f"frame poc={plan.poc}: levels={nlv}")
    for k, v in sorted(st.items()):
        print(f"  class pl={k[0]} log2={k[1]}: maxlvl={v[0]} tot={v[1]}")
    print("cfg.intra:", cfg.intra, "C:", cfg.intra_C)
    cfg_i = replace(cfg, skip_mc=True)
    t0 = time.time()
    t = pack_frame(plan, cfg_i, {plan.frame_id: 0}, real_slots=True)
    print(f"pack_frame: {time.time()-t0:.2f}s")

    H, W = cfg.H, cfg.W
    Y = jnp.zeros((H, W), jnp.int32)
    Cb = jnp.zeros((H // 2, W // 2), jnp.int32)
    Cr = jnp.zeros((H // 2, W // 2), jnp.int32)
    td = {k: jnp.asarray(v) for k, v in t.items()}

    def timeit(name, cfg_use, reps=3):
        fn = jax.jit(lambda Y, Cb, Cr, td: intra_stage(Y, Cb, Cr, td,
                                                       cfg_use))
        r = fn(Y, Cb, Cr, td)
        float(r[0][0, 0])
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = fn(Y, Cb, Cr, td)
            float(r[0][0, 0])
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1000:.1f} ms  (C={cfg_use.intra_C}, "
              f"{len(cfg_use.intra)} classes)")
        return min(ts)

    full = timeit("full intra_stage", cfg_i)
    half = timeit("half levels", replace(cfg_i, intra_C=cfg.intra_C // 2))
    ten = timeit("10 levels", replace(cfg_i, intra_C=10))
    per_iter = (full - ten) / max(1, cfg.intra_C - 10)
    print(f"per-level-iteration cost: {per_iter*1e6:.0f} us")
    luma = tuple(c for c in cfg.intra if c[0] == 0)
    if luma and luma != cfg.intra:
        timeit("luma classes only", replace(cfg_i, intra=luma))
    for c in cfg.intra:
        timeit(f"only class pl={c[0]} log2={c[1]}",
               replace(cfg_i, intra=(c,)))


if __name__ == "__main__":
    main()
