"""End-to-end: the fused device-resident frame program decodes the golden
vectors bit-exactly (decode_stream_native backend='device' vs manifest
MD5s). Inter frames ride the fused program (MC tile tables + residuals +
on-device filter planning + DPB-stack insert); intra/PCM/etc frames use
the hybrid path and land in the same device DPB."""
import json
import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

CASES = [
    ("manifest_inter.json", "p_deblk"),
    ("manifest_inter.json", "p_mv"),
    ("manifest_inter.json", "b_mv"),
    ("manifest_inter.json", "p_filters"),
    ("manifest_inter.json", "p_mixed"),
    ("manifest_inter.json", "p_mixedlf"),
    ("manifest_inter.json", "p_2ref"),
    ("manifest_inter.json", "p_bigmv"),
    ("manifest_inter.json", "p_wppx"),
    ("manifest_inter.json", "p_tiles22"),
    ("manifest_inter.json", "p_slices2"),
    ("manifest_inter.json", "b_mixed"),
    ("manifest_inter.json", "b_mv"),
    ("manifest_inter.json", "p_wp"),
    ("manifest_inter.json", "p_tmvp"),
    ("manifest_inter.json", "p_sao"),
    ("manifest_inter.json", "p_10bit"),
    ("manifest_inter.json", "p_cu8"),
    ("manifest_inter.json", "p_pcm"),
    ("manifest_inter.json", "p_tqbypass"),
    ("manifest_inter.json", "p_cra"),
    ("manifest_inter.json", "p_ttsplit"),
    ("manifest_inter.json", "p_2pu"),
    ("manifest_inter.json", "p_2pu_amp"),
    ("manifest_inter.json", "b_2pu_merge"),
    ("manifest_inter.json", "p_2pu_filters"),
    ("manifest_inter.json", "p_sdh"),
    ("manifest_inter.json", "p_tskip"),
    ("manifest_inter.json", "p_qpdelta"),
]


def _manifest(fn):
    with open(os.path.join(DATA, fn)) as f:
        return json.load(f)


@pytest.mark.parametrize("mf,name", CASES)
def test_device_stream_golden(mf, name):
    path = os.path.join(DATA, name + ".bin")
    if not os.path.exists(path):
        pytest.skip(name + " vector absent")
    man = _manifest(mf)
    if name not in man:
        pytest.skip(name + " not in manifest")
    from libde265_tpu.api import decode_stream_native
    with open(path, "rb") as f:
        data = f.read()
    m = man[name]
    pics = decode_stream_native(data, backend="device")
    assert len(pics) == m["frames"], (len(pics), m["frames"])
    for i, pic in enumerate(pics):
        got = [pic.plane_md5(c) for c in range(3)]
        want = [m["md5"][i][k] for k in ("y", "u", "v")]
        assert got == want, f"{name} frame {i}: {got} != {want}"


def test_fast_path_actually_used():
    """Guard: the fused program (not the hybrid fallback) must carry the
    inter frames of a plain P stream."""
    from libde265_tpu.api import decode_stream_native
    from libde265_tpu import device_stream
    from libde265_tpu.frame_program import frame_compatible
    from libde265_tpu.native_frontend import NativeFrontend
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.bitstream.paramsets import read_sps, read_pps
    with open(os.path.join(DATA, "p_mv.bin"), "rb") as f:
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
    n_compat = sum(1 for p in plans if p.nal_type != -1
                   and frame_compatible(p))
    assert n_compat >= len(plans) - 1, \
        f"only {n_compat}/{len(plans)} frames fast-path eligible"


def test_stream_scan_program_matches_per_frame():
    """The lax.scan whole-stream program (get_stream_program) must leave the
    device DPB in exactly the state the per-frame program produces."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from libde265_tpu.frame_program import (REF_SLOTS, stream_cfg, pack_frame,
                                            frame_compatible, get_program,
                                            get_stream_program, init_tables,
                                            update_tables)
    from libde265_tpu.native_frontend import NativeFrontend
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.bitstream.paramsets import read_sps, read_pps
    from libde265_tpu.api import decode_stream_native

    with open(os.path.join(DATA, "p_mv.bin"), "rb") as f:
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
    cfg = stream_cfg(plans, plans[0].sps)
    pframes = [p for p in plans if p.nal_type != -1 and frame_compatible(p)]
    assert pframes, "test stream must have fused-path frames"
    fid_slot = {plans[0].frame_id: 0}
    for i, p in enumerate(pframes):
        fid_slot[p.frame_id] = 1 + i % (REF_SLOTS - 1)
    packed = [pack_frame(p, cfg, fid_slot, real_slots=True) for p in pframes]

    # bootstrap the IDR from the decoder itself
    pics = decode_stream_native(data)
    H, W = cfg.H, cfg.W
    f0 = [np.asarray(p, np.int16) for p in pics[0].planes]
    def fresh():
        dy = jnp.zeros((REF_SLOTS, H, W), jnp.int16).at[0].set(f0[0])
        dcb = jnp.zeros((REF_SLOTS, H // 2, W // 2), jnp.int16).at[0].set(f0[1])
        dcr = jnp.zeros((REF_SLOTS, H // 2, W // 2), jnp.int16).at[0].set(f0[2])
        ty, tc = init_tables(cfg)
        ty, tc = update_tables(ty, tc, dy[0], dcb[0], dcr[0],
                                     np.int32(0), cfg)
        return dy, dcb, dcr, ty, tc

    prog = get_program(cfg)
    state = fresh()
    for p, t in zip(pframes, packed):
        td = {k: jnp.asarray(v) for k, v in t.items()}
        state = prog(*state, td, np.int32(fid_slot[p.frame_id]))
    ref_state = [np.asarray(x) for x in state]

    sprog = get_stream_program(cfg)
    stacked = {k: jnp.asarray(np.stack([t[k] for t in packed]))
               for k in packed[0]}
    slots = jnp.asarray([fid_slot[p.frame_id] for p in pframes],
                        dtype=jnp.int32)
    state = sprog(*fresh(), stacked, slots)
    for a, b in zip(ref_state, state):
        assert (a == np.asarray(b)).all()

    # per-dtype-blob upload variant: same end state
    from libde265_tpu.frame_program import (blob_meta, pack_blob,
                                            get_stream_program_blob)
    stacked_np = {k: np.stack([t[k] for t in packed]) for k in packed[0]}
    meta, totals = blob_meta(stacked_np)
    bufs = {k: jnp.asarray(v)
            for k, v in pack_blob(stacked_np, meta, totals).items()}
    bprog = get_stream_program_blob(cfg, meta)
    state = bprog(*fresh(), bufs, slots)
    for a, b in zip(ref_state, state):
        assert (a == np.asarray(b)).all()
