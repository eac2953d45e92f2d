"""Range-extension residual tools decode bit-exact vs the dec265 goldens
(manifest_rext_tools.json, minted by tools/gen_rext_tool_streams.py):
cross-component prediction, explicit & implicit RDPCM, transform-skip
rotation & contexts, persistent Rice adaptation, disabled intra
smoothing, TU-level chroma QP offset lists — isolated and combined.

Reference: /root/reference/libde265/slice.cc:2937-2951,3330-3376,
3530-3558,3610-3635 and transform.cc:235-251,395-429.
"""
import hashlib
import json
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

with open(os.path.join(DATA, "manifest_rext_tools.json")) as f:
    MANIFEST = json.load(f)


def _check_planes(planes, man, i, name):
    dt = np.uint8 if man["bit_depth"] == 8 else np.uint16
    keys = ("y", "u", "v") if man["chroma_format"] else ("y",)
    for pl, k in zip(planes, keys):
        got = hashlib.md5(
            np.ascontiguousarray(np.asarray(pl).astype(dt)).tobytes()
        ).hexdigest()
        assert got == man["md5"][i][k], (name, i, k)


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_rext_tool_python_path(name):
    """Python front-end + reference reconstruction."""
    import libde265_tpu as lib
    man = MANIFEST[name]
    pics = lib.decode_stream(
        open(os.path.join(DATA, name + ".bin"), "rb").read())
    assert len(pics) == man["frames"]
    for i, p in enumerate(pics):
        _check_planes(p.planes, man, i, name)


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_rext_tool_native_path(name):
    """C++ front-end (native/frontend.cc rext syntax) + reconstruction."""
    from libde265_tpu.api import decode_stream_native
    man = MANIFEST[name]
    pics = decode_stream_native(
        open(os.path.join(DATA, name + ".bin"), "rb").read())
    assert len(pics) == man["frames"]
    for i, p in enumerate(pics):
        _check_planes(p.planes, man, i, name)
