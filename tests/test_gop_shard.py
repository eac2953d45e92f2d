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
