"""Device-op differential tests (CPU backend): JAX filters + batched MC must
match the numpy reference ops on real stream data."""
import os
import numpy as np
import pytest


def _plans(name):
    from libde265_tpu.native_frontend import NativeFrontend
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.bitstream.paramsets import read_sps, read_pps
    stream = open(os.path.join(os.path.dirname(__file__), "data", name + ".bin"), "rb").read()
    spss, ppss = {}, {}
    for u in split_annexb(stream):
        if u.header.nal_unit_type == 33:
            s = read_sps(u.data); spss[s.seq_parameter_set_id] = s
        elif u.header.nal_unit_type == 34:
            p = read_pps(u.data, spss); ppss[p.pic_parameter_set_id] = p
    return NativeFrontend().parse(stream, spss, ppss)


@pytest.mark.parametrize("name", ["p_filters"])
def test_jax_filters_match(name):
    from libde265_tpu.reconstruct import reconstruct_frame
    from libde265_tpu.api import _RefShim
    import libde265_tpu.ops.deblock_ref as dref
    import libde265_tpu.ops.sao_ref as sref
    from libde265_tpu.ops.deblock_jax import deblock_frame_jax
    from libde265_tpu.ops.sao_jax import sao_frame_jax
    plans = _plans(name)
    refs = _RefShim()
    for plan in plans:
        planes_ref = reconstruct_frame(plan, dpb_images=refs)
        saved_d, saved_s = dref.deblock_frame, sref.sao_frame
        dref.deblock_frame = deblock_frame_jax
        sref.sao_frame = sao_frame_jax
        refs2 = _RefShim(); refs2.pics = dict(refs.pics)
        planes_dev = reconstruct_frame(plan, dpb_images=refs2)
        dref.deblock_frame, sref.sao_frame = saved_d, saved_s
        for a, b in zip(planes_ref, planes_dev):
            assert np.array_equal(a, b)
        refs.add(plan.frame_id, plan, planes_ref)


@pytest.mark.parametrize("name", ["p_bigmv", "p_wp"])
def test_device_mc_match(name):
    from libde265_tpu.reconstruct import reconstruct_frame
    from libde265_tpu.api import _RefShim
    import libde265_tpu.ops.inter_ref as iref
    from libde265_tpu.ops.mc_tile_jax import motion_compensate_frame_tile
    plans = _plans(name)
    refs = _RefShim()
    for plan in plans:
        saved = iref.motion_compensate_frame
        planes_ref = reconstruct_frame(plan, dpb_images=refs)
        iref.motion_compensate_frame = \
            lambda pl, planes, dpb: motion_compensate_frame_tile(pl, planes, dpb)
        refs2 = _RefShim(); refs2.pics = dict(refs.pics)
        planes_dev = reconstruct_frame(plan, dpb_images=refs2)
        iref.motion_compensate_frame = saved
        for a, b in zip(planes_ref, planes_dev):
            assert np.array_equal(a, b)
        refs.add(plan.frame_id, plan, planes_ref)


@pytest.mark.parametrize("name", ["p_filters", "p_10bit", "p_wp", "b_mixed",
                                  "p_tiles22", "p_ltr"])
def test_full_device_pipeline(name):
    """decode_stream_native(backend='device') must be bit-exact."""
    import json
    from libde265_tpu.api import decode_stream_native
    m = json.load(open(os.path.join(os.path.dirname(__file__), "data",
                                    "manifest_inter.json")))[name]
    pics = decode_stream_native(
        open(os.path.join(os.path.dirname(__file__), "data", name + ".bin"),
             "rb").read(), backend="device")
    assert len(pics) == m["frames"]
    for i, pic in enumerate(pics):
        got = [pic.plane_md5(c) for c in range(3)]
        want = [m["md5"][i][k] for k in ("y", "u", "v")]
        assert got == want
