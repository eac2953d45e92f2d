#!/usr/bin/env python3
"""Sub-stage probe for the two hot stages of the 4K frame program.

profile_frame_stages.py attributes ~47 ms/frame each to MC and deblock;
this probe splits those further on real bench-stream tensors:
  MC:      table-row gather only / + luma filter / full 3-plane MC
  deblock: planner only / planner+luma passes / full (+chroma)
Each variant runs as a lax.scan over the stream's packed frames (inputs
vary per step, so nothing hoists), repeated --rounds times.

Usage: python tools/probe_mc_deblock.py [stream] [--rounds N]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA = os.path.join(REPO, "tests", "data")


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from libde265_tpu.frame_program import (REF_SLOTS, stream_cfg, pack_frame,
                                            frame_compatible, _expand_ctb4,
                                            _expand_grid2)
    from libde265_tpu.ops.mc_tile_jax import (build_tables, mc_frame_tile,
                                              _luma_pred_tile)
    from libde265_tpu.ops.filter_plan_jax import plan_deblock_device
    from libde265_tpu.ops.deblock_jax import (deblock_luma_pass,
                                              deblock_chroma_pass)
    from bench import parse_stream

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    stream = args[0] if args else "ld4k_light"
    rounds = 4
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])

    with open(os.path.join(DATA, stream + ".bin"), "rb") as f:
        data = f.read()
    with open(os.path.join(DATA, "manifest_big.json")) as f:
        man = json.load(f)[stream]
    W, H = man["w"], man["h"]
    plans = parse_stream(data)
    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = stream_cfg(plans, plans[0].sps, use_pallas=on_tpu)
    pframes = [p for p in plans if p.nal_type != -1 and frame_compatible(p)]
    fid_slot = {plans[0].frame_id: 0}
    for i, p in enumerate(pframes):
        fid_slot[p.frame_id] = 1 + i % (REF_SLOTS - 1)
    packed = [pack_frame(p, cfg, fid_slot) for p in pframes]
    sd = {k: jax.device_put(np.stack([t[k] for t in packed]))
          for k in packed[0]}
    nf = len(pframes)
    gh, gw = H // 4, W // 4
    N = gh * gw
    Hc, Wc = H // 2, W // 2

    # static tables from a zero DPB (timing only; values irrelevant)
    dy0 = jnp.zeros((REF_SLOTS, H, W), jnp.int16)
    dcb0 = jnp.zeros((REF_SLOTS, Hc, Wc), jnp.int16)
    dcr0 = jnp.zeros((REF_SLOTS, Hc, Wc), jnp.int16)
    sel0 = np.asarray(packed[0]["sel_slots"])
    tables = jax.jit(lambda a, b, c: build_tables(
        a, b, c, use_pallas=cfg.use_pallas,
        bitdepth=cfg.bitdepth))(dy0[sel0], dcb0[sel0], dcr0[sel0])
    tables = jax.block_until_ready(tables)

    nty, ntx = (H + 20) // 4, (W + 20) // 4

    def expand_t(t):
        tt = dict(t)
        if cfg.pu_grid8:
            for k in ("mv", "poc", "pf", "slot"):
                tt[k] = _expand_grid2(tt[k], gh, gw)
        return tt

    def mc_inputs(t):
        """Replicates decode_frame_device's MC input assembly."""
        tt = expand_t(t)
        slot_g = tt["slot"].astype(jnp.int32)
        pfg = tt["pf"].astype(jnp.int32)
        mvg = tt["mv"].astype(jnp.int32)
        swap = pfg[:, :, 0] == 0
        mv0 = jnp.where(swap[..., None], mvg[:, :, 1, :], mvg[:, :, 0, :])
        s0 = jnp.where(swap, slot_g[:, :, 1], slot_g[:, :, 0])
        pf_l = jnp.stack([pfg[:, :, 0] | pfg[:, :, 1],
                          pfg[:, :, 0] & pfg[:, :, 1]], axis=-1)
        mv = jnp.stack([mv0, mvg[:, :, 1, :]], axis=2).reshape(N, 2, 2)
        slot = jnp.stack([s0, slot_g[:, :, 1]], axis=-1).reshape(N, 2)
        pf = pf_l.reshape(N, 2)
        wts = jnp.zeros((N, 3, 5), jnp.int32)
        ex = jnp.zeros((N,), bool)
        return mv, slot, pf, wts, ex

    bx = (jnp.arange(N, dtype=jnp.int32) % gw) * 4
    by = (jnp.arange(N, dtype=jnp.int32) // gw) * 4

    def v_mc_gather(tab3, t):
        mv, slot, pf, wts, ex = mc_inputs(t)
        mvx, mvy, s0 = mv[:, 0, 0], mv[:, 0, 1], slot[:, 0]
        x0 = jnp.clip(bx + (mvx >> 2) - 3, -14, W + 1)
        y0 = jnp.clip(by + (mvy >> 2) - 3, -14, H + 1)
        tx = (x0 + 16) >> 2
        ty = (y0 + 16) >> 2
        idx = (s0 * nty + ty) * ntx + tx
        win = tab3[0][idx]
        return win.astype(jnp.int32).sum()

    def v_mc_luma(tab3, t):
        mv, slot, pf, wts, ex = mc_inputs(t)
        out = _luma_pred_tile(tab3[0], nty, ntx, bx, by, mv[:, 0, 0],
                              mv[:, 0, 1], slot[:, 0], H, W,
                              min(4, cfg.bitdepth - 8))
        return out.sum()

    def v_mc_full(tab3, t):
        mv, slot, pf, wts, ex = mc_inputs(t)
        mcp = mc_frame_tile(tab3, (H, W), mv, slot, pf, wts, ex,
                            cfg.bitdepth, bi=cfg.has_bi)
        return sum(p.sum() for p in mcp)

    # ---- luma tap-pass arithmetic experiments (8-bit only): the h-pass
    # accumulation fits int16 (255 * sum|taps| = 28560 < 2^15) and the
    # v-pass fits f32's 24-bit mantissa (28560 * 112 = 3.2M < 2^24), so
    # both narrower forms are bit-exact; the question is VPU cost.
    def _luma_pre(t):
        mv, slot, pf, wts, ex = mc_inputs(t)
        mvx, mvy, s0 = mv[:, 0, 0], mv[:, 0, 1], slot[:, 0]
        x0 = jnp.clip(bx + (mvx >> 2) - 3, -14, W + 1)
        y0 = jnp.clip(by + (mvy >> 2) - 3, -14, H + 1)
        tx = (x0 + 16) >> 2
        ty2 = (y0 + 16) >> 2
        dx = (x0 + 16) & 3
        dy2 = (y0 + 16) & 3
        idx = (s0 * nty + ty2) * ntx + tx
        from libde265_tpu.ops.lut import take_rows_small
        from libde265_tpu.ops.mc_tile_jax import TH_Y
        th = take_rows_small(TH_Y, (mvx & 3) * 4 + dx)
        tv = take_rows_small(TH_Y, (mvy & 3) * 4 + dy2)
        return idx, th, tv

    def v_mc_luma_h16f32(tab3, t):
        """h-pass int16, v-pass f32."""
        idx, th, tv = _luma_pre(t)
        w16 = tab3[0][idx].astype(jnp.int16)
        th16 = th.astype(jnp.int16)
        tvf = tv.astype(jnp.float32)
        tmp = sum(w16[:, 16 * u:16 * u + 80] * th16[:, u, None]
                  for u in range(11))
        tf = tmp.astype(jnp.float32)
        out = sum(tf[:, u:u + 64] * tvf[:, u, None]
                  for u in range(11)).astype(jnp.int32) >> 6
        return out.sum()

    def v_mc_luma_h16i32(tab3, t):
        """h-pass int16, v-pass int32."""
        idx, th, tv = _luma_pre(t)
        w16 = tab3[0][idx].astype(jnp.int16)
        th16 = th.astype(jnp.int16)
        tmp = sum(w16[:, 16 * u:16 * u + 80] * th16[:, u, None]
                  for u in range(11))
        t32 = tmp.astype(jnp.int32)
        out = sum(t32[:, u:u + 64] * tv[:, u, None]
                  for u in range(11)) >> 6
        return out.sum()

    def v_mc_luma_pre32(tab3, t):
        """baseline but window converted to int32 ONCE before slicing."""
        idx, th, tv = _luma_pre(t)
        w32 = tab3[0][idx].astype(jnp.int32)
        tmp = sum(w32[:, 16 * u:16 * u + 80] * th[:, u, None]
                  for u in range(11))
        out = sum(tmp[:, u:u + 64] * tv[:, u, None]
                  for u in range(11)) >> 6
        return out.sum()

    def v_dbk_plan(tab3, t):
        lm, cm = plan_deblock_device(expand_t(t), cfg.fcfg)
        s = sum(m.sum() for d in lm for m in d)
        if cm is not None:
            s = s + sum(m.sum() for d in cm for m in d)
        return s

    def v_dbk_luma(tab3, t):
        lm, cm = plan_deblock_device(expand_t(t), cfg.fcfg)
        Y = jnp.zeros((H, W), jnp.int32)
        for vi, vertical in enumerate((True, False)):
            Y = deblock_luma_pass(Y, *lm[vi], vertical=vertical,
                                  bitdepth=cfg.bitdepth)
        return Y.sum()

    def v_dbk_full(tab3, t):
        lm, cm = plan_deblock_device(expand_t(t), cfg.fcfg)
        Y = jnp.zeros((H, W), jnp.int32)
        Cb = jnp.zeros((Hc, Wc), jnp.int32)
        Cr = jnp.zeros((Hc, Wc), jnp.int32)
        for vi, vertical in enumerate((True, False)):
            Y = deblock_luma_pass(Y, *lm[vi], vertical=vertical,
                                  bitdepth=cfg.bitdepth)
            if cm is not None:
                act, tc, p_off, q_off = cm[vi]
                Cb = deblock_chroma_pass(Cb, act[0], tc[0], p_off, q_off,
                                         vertical=vertical,
                                         bitdepth=cfg.bitdepth)
                Cr = deblock_chroma_pass(Cr, act[1], tc[1], p_off, q_off,
                                         vertical=vertical,
                                         bitdepth=cfg.bitdepth)
        return Y.sum() + Cb.sum() + Cr.sum()

    variants = [("mc_gather", v_mc_gather), ("mc_luma", v_mc_luma),
                ("mc_luma_h16f32", v_mc_luma_h16f32),
                ("mc_luma_h16i32", v_mc_luma_h16i32),
                ("mc_luma_pre32", v_mc_luma_pre32),
                ("mc_full", v_mc_full), ("dbk_plan", v_dbk_plan),
                ("dbk_luma", v_dbk_luma), ("dbk_full", v_dbk_full)]
    only = [a.split("=", 1)[1].split(",") for a in sys.argv
            if a.startswith("--only=")]
    if only:
        variants = [v for v in variants if v[0] in only[0]]

    for name, fn in variants:
        def prog(tab3, ts, _fn=fn):
            def step(carry, t):
                return carry + _fn(tab3, t), 0
            out, _ = jax.lax.scan(step, jnp.int32(0), ts)
            return out
        jfn = jax.jit(prog)
        t0 = time.time()
        r = jfn(tables, sd)
        _ = int(r)
        print(f"# {name}: compile+1st {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        for _ in range(rounds):
            r = jfn(tables, sd)
        _ = int(r)
        ms = (time.time() - t0) / (rounds * nf) * 1000.0
        print(json.dumps({"variant": name, "ms_per_frame": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
