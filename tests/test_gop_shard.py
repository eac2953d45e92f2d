"""GOP-sharded multi-device decode (parallel/gop_shard.py): the 96-frame
gop1080p stream (16 closed GOPs) decodes with one GOP per device on the
virtual 8-device CPU mesh, zero collectives, bit-exact vs dec265."""
import hashlib
import json
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.slow
def test_gop_shard_bitexact():
    import jax
    from jax.sharding import Mesh
    from libde265_tpu.parallel.gop_shard import decode_gops_sharded
    from tests.test_intra_fused import _parse

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    plans = _parse(os.path.join(DATA, "gop1080p.bin"))
    with open(os.path.join(DATA, "manifest_big.json")) as f:
        man = json.load(f)["gop1080p"]
    mesh = Mesh(np.array(devs[:8]), ("g",))
    (dy, dcb, dcr, ty, tc), where, gops = decode_gops_sharded(
        plans, plans[0].sps, mesh)
    dy = np.asarray(dy)
    dcb = np.asarray(dcb)
    dcr = np.asarray(dcr)
    # verify the LAST frame written to each slot of each GOP shard
    # against the golden MD5s (48 frames over 8 GOPs)
    idx_of = {p.frame_id: i for i, p in enumerate(plans)}
    last = {}
    for gi, g in enumerate(gops):
        for p in g:
            _, slot, _ = where[p.frame_id]
            last[(gi, slot)] = p
    checked = 0
    for (gi, slot), p in last.items():
        i = idx_of[p.frame_id]
        got = [hashlib.md5(pl[gi, slot].astype(np.uint8).tobytes())
               .hexdigest() for pl in (dy, dcb, dcr)]
        want = [man["md5"][i][k] for k in ("y", "u", "v")]
        assert got == want, f"gop {gi} slot {slot} (frame {i})"
        checked += 1
    assert checked >= 40, checked


def test_decode_gop_device_api():
    """End-to-end consumer API: native FE parse + GOP-sharded device
    program with per-frame emission, batched over GOP chunks when the
    stream has more GOPs than mesh devices. Every frame MD5-checked."""
    import hashlib
    import json
    import os
    import numpy as np
    from libde265_tpu.parallel.gop_parallel import decode_gop_device
    DATA = os.path.join(os.path.dirname(__file__), "data")
    path = os.path.join(DATA, "gop1080p.bin")
    if not os.path.exists(path):
        import pytest
        pytest.skip("bench stream not generated")
    man = json.load(open(os.path.join(DATA, "manifest_big.json")))["gop1080p"]
    frames = decode_gop_device(open(path, "rb").read())
    assert len(frames) == man["frames"]
    W, H = man["w"], man["h"]
    for i, (poc, yuv) in enumerate(frames):
        y = yuv[:W * H]
        u = yuv[W * H:W * H + W * H // 4]
        v = yuv[W * H + W * H // 4:]
        for pl, k in zip((y, u, v), ("y", "u", "v")):
            assert hashlib.md5(pl).hexdigest() == man["md5"][i][k], (i, k)
