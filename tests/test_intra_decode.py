"""End-to-end bit-exactness: decode generated streams, compare per-plane MD5
against the reference decoder's golden output (manifest.json)."""
import hashlib
import json
import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def _manifest():
    with open(os.path.join(DATA, "manifest.json")) as f:
        return json.load(f)


def _decode_and_check(name):
    from libde265_tpu.api import decode_stream
    m = _manifest()[name]
    with open(os.path.join(DATA, name + ".bin"), "rb") as f:
        stream = f.read()
    pics = decode_stream(stream)
    assert len(pics) == m["frames"], f"got {len(pics)} frames, want {m['frames']}"
    for i, pic in enumerate(pics):
        got = [pic.plane_md5(c) for c in range(3)]
        want = [m["md5"][i][k] for k in ("y", "u", "v")]
        assert got == want, f"{name} frame {i}: {got} != {want}"


@pytest.mark.parametrize("name", [
    "intra_64x64_q27",
    "intra_64x64_q37",
    "intra_cif_q30",
    "intra_cif_q20_nxn",
    "intra_cif_maxcb64",
    "intra_104x72_q26",
])
def test_intra_stream(name):
    _decode_and_check(name)
