"""Differential tests: C++ front-end must produce plans identical to the
Python front-end, and native-path decode must be bit-exact."""
import json
import os
import subprocess
import sys

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
SO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "native", "libhevc_frontend.so")


def _ensure_built():
    if not os.path.exists(SO):
        subprocess.run(["make", "-C", os.path.dirname(SO)], check=True)


@pytest.mark.parametrize("name", ["p_mixed", "p_filters", "p_tmvp",
                                  "intra_64x64_q27", "i_deblk_sao"])
def test_native_decode_bitexact(name):
    _ensure_built()
    from libde265_tpu.api import decode_stream_native
    mf = "manifest_inter.json" if name.startswith(("p_", "i_")) else "manifest.json"
    m = json.load(open(os.path.join(DATA, mf)))[name]
    pics = decode_stream_native(open(os.path.join(DATA, name + ".bin"), "rb").read())
    assert len(pics) == m["frames"]
    for i, pic in enumerate(pics):
        got = [pic.plane_md5(c) for c in range(3)]
        want = [m["md5"][i][k] for k in ("y", "u", "v")]
        assert got == want, f"{name} frame {i}"


def test_wavefront_replay_differential():
    """The CTB-row wavefront motion replay must produce byte-identical
    plans (PU list order and every motion grid) vs the serial decode-order
    walk, on a stream big enough to take the parallel path."""
    import os
    import numpy as np
    _ensure_built()
    from libde265_tpu.native_frontend import NativeFrontend
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.bitstream.paramsets import read_sps, read_pps
    path = os.path.join(DATA, "ld4k_light.bin")
    if not os.path.exists(path):
        import pytest
        pytest.skip("bench stream not generated")
    data = open(path, "rb").read()
    spss, ppss = {}, {}
    for u in split_annexb(data):
        t = u.header.nal_unit_type
        if t == 33:
            s = read_sps(u.data); spss[s.seq_parameter_set_id] = s
        elif t == 34:
            p = read_pps(u.data, spss); ppss[p.pic_parameter_set_id] = p

    def plans_with(replay_threads):
        os.environ["FE_REPLAY_THREADS"] = str(replay_threads)
        try:
            return NativeFrontend().parse(data, spss, ppss)
        finally:
            del os.environ["FE_REPLAY_THREADS"]

    a = plans_with(1)
    b = plans_with(4)
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        ma, _ = pa._pu_arrays
        mb, _ = pb._pu_arrays
        assert np.array_equal(ma, mb), f"PU mismatch poc={pa.poc}"
        assert np.array_equal(pa.mv, pb.mv)
        assert np.array_equal(pa.pred_flag, pb.pred_flag)
        assert np.array_equal(pa.ref_idx, pb.ref_idx)
        assert np.array_equal(pa.ref_poc, pb.ref_poc)
