"""Differential test: on-device loop-filter planning (ops/filter_plan_jax)
vs the host per-edge planners (ops/deblock_jax, ops/sao_jax), which are
golden-MD5-verified. Runs over real plans from a spread of test vectors
(deblock-heavy, SAO, multi-slice, tiles, WPP, mixed filter flags, 10-bit)."""
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

STREAMS = ["p_deblk", "p_filters", "i_deblk_sao", "p_mixed", "p_tiles22",
           "p_wppx", "p_slices2", "p_mixedlf", "p_10bit", "b_mixed"]


def _plans(name):
    from libde265_tpu.api import decode_stream_native
    from libde265_tpu.native_frontend import NativeFrontend
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.bitstream.paramsets import read_sps, read_pps
    with open(os.path.join(DATA, name + ".bin"), "rb") as f:
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
    return NativeFrontend().parse(data, spss, ppss)


@pytest.mark.parametrize("name", STREAMS)
def test_deblock_plan_device_matches_host(name):
    if not os.path.exists(os.path.join(DATA, name + ".bin")):
        pytest.skip(name + " vector absent")
    import jax.numpy as jnp
    from libde265_tpu.ops.deblock_jax import (plan_luma_metadata,
                                              plan_chroma_metadata)
    from libde265_tpu.ops.filter_plan_jax import plan_deblock_device
    from libde265_tpu.device_plan import build_filter_grids, filter_cfg

    for plan in _plans(name)[:3]:
        if plan.nal_type == -1 or not plan.slice_headers:
            continue
        grids = {k: jnp.asarray(v) for k, v in build_filter_grids(plan).items()}
        lm, cm = plan_deblock_device(grids, filter_cfg(plan))
        for vi, vertical in enumerate((True, False)):
            host = plan_luma_metadata(plan, vertical)
            dev = [np.asarray(a) for a in lm[vi]]
            hbs = host[0]
            assert np.array_equal(dev[0], hbs), \
                f"{name} poc{plan.poc} v={vertical} bs mismatch " \
                f"({(dev[0] != hbs).sum()} cells)"
            m = hbs > 0
            for k, nm in ((1, "qp"), (2, "beta"), (3, "tc"),
                          (4, "p_off"), (5, "q_off")):
                assert np.array_equal(np.where(m, dev[k], 0),
                                      np.where(m, host[k], 0)), \
                    f"{name} poc{plan.poc} v={vertical} {nm} mismatch"
        if plan.sps.ChromaArrayType:
            for vi, vertical in enumerate((True, False)):
                act_h, tc_h, po_h, qo_h = plan_chroma_metadata(plan, vertical)
                act_d, tc_d, po_d, qo_d = [np.asarray(a) for a in cm[vi]]
                assert np.array_equal(act_d, act_h), \
                    f"{name} poc{plan.poc} v={vertical} chroma act"
                m = act_h
                assert np.array_equal(np.where(m, tc_d, 0),
                                      np.where(m, tc_h, 0))
                m2 = act_h.any(0)
                assert np.array_equal(po_d & m2, po_h & m2)
                assert np.array_equal(qo_d & m2, qo_h & m2)


@pytest.mark.parametrize("name", STREAMS)
def test_sao_plan_device_matches_host(name):
    if not os.path.exists(os.path.join(DATA, name + ".bin")):
        pytest.skip(name + " vector absent")
    import jax.numpy as jnp
    from libde265_tpu.ops.sao_jax import plan_sao_maps
    from libde265_tpu.ops.filter_plan_jax import plan_sao_device
    from libde265_tpu.device_plan import build_filter_grids, sao_cfg

    for plan in _plans(name)[:3]:
        if plan.nal_type == -1 or not plan.slice_headers:
            continue
        grids = {k: jnp.asarray(v) for k, v in build_filter_grids(plan).items()}
        for ci in range(3 if plan.sps.ChromaArrayType else 1):
            host = plan_sao_maps(plan, ci)
            dev = plan_sao_device(grids, sao_cfg(plan), ci)
            t_d, eo_d, b_d, off_d, skip_d, avail_d = \
                [np.asarray(a) for a in dev]
            if host is None:
                assert not t_d.any(), f"{name} poc{plan.poc} c{ci} type!=0"
                continue
            t_h, eo_h, b_h, off_h, skip_h, avail_h = host
            assert np.array_equal(t_d, t_h), f"{name} c{ci} type"
            m = t_h > 0
            assert np.array_equal(np.where(m, eo_d, 0), np.where(m, eo_h, 0))
            assert np.array_equal(np.where(m, b_d, 0), np.where(m, b_h, 0))
            for k in range(4):
                assert np.array_equal(np.where(m, off_d[k], 0),
                                      np.where(m, off_h[k], 0))
            assert np.array_equal(skip_d & m, skip_h & m)
            for k in range(4):
                assert np.array_equal(avail_d[k] | ~m, avail_h[k] | ~m), \
                    f"{name} poc{plan.poc} c{ci} avail dir {k}"
