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
