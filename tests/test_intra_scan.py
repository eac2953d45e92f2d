"""Pallas serial band-scan intra kernel (ops/pallas/intra_scan.py) in
interpret mode on CPU: same streams as the fori wavefront path, same
dec265 golden MD5s. DE265_INTRA_SCAN=force routes intra_stage through
the kernel without use_pallas (which would also enable the Mosaic MC
tables that have no interpret path wired here)."""
import json
import hashlib
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

CASES = [
    ("manifest.json", "intra_cif_q30"),
    ("manifest.json", "intra_cif_q20_nxn"),      # NxN 4x4 luma TUs
    ("manifest.json", "intra_cif_maxcb64"),      # 32x32 TUs
    ("manifest.json", "intra_104x72_q26"),       # odd dims, partial bands
    ("manifest_inter.json", "i_strong32"),       # strong smoothing
    ("manifest_inter.json", "i_tskip_nxn"),      # transform-skip intra
    ("manifest_inter.json", "p_cip"),            # constrained intra pred
    ("manifest_inter.json", "p_cif_mixed"),      # intra-in-P + tiles/WPP
    ("manifest_inter.json", "p_mixed"),
    ("manifest_inter.json", "p_10bit"),          # Main-10: hi/lo matvec
]


def _parse(path):
    from libde265_tpu.native_frontend import NativeFrontend
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.bitstream.paramsets import read_sps, read_pps
    with open(path, "rb") as f:
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


@pytest.fixture
def force_scan(monkeypatch):
    monkeypatch.setenv("DE265_INTRA_SCAN", "force")


@pytest.mark.parametrize("mf,name", CASES)
def test_intra_scan_matches_goldens(mf, name, force_scan):
    from libde265_tpu.frame_program import stream_cfg, frame_compatible, \
        frame_has_intra
    from libde265_tpu.device_stream import DeviceStreamDecoder
    path = os.path.join(DATA, name + ".bin")
    if not os.path.exists(path):
        pytest.skip(name + " vector absent")
    with open(os.path.join(DATA, mf)) as f:
        man = json.load(f)
    m = man[name]
    plans = _parse(path)
    cfg = stream_cfg(plans, plans[0].sps)
    if not cfg.intra_scan:
        pytest.skip("stream not scan-eligible (10-bit or no intra)")
    dec = DeviceStreamDecoder(plans, plans[0].sps)
    assert dec.cfg.intra_scan, "decoder cfg must route the scan kernel"
    dec.decode_all()
    n = 0
    for i, p in enumerate(plans):
        planes = dec.planes_of(p.frame_id)
        got = [hashlib.md5(pl.tobytes()).hexdigest() for pl in planes]
        want = [m["md5"][i][k] for k in ("y", "u", "v")]
        assert got == want, f"{name} frame {i} (poc {p.poc})"
        if dec.frames[p.frame_id]["fast"] and frame_has_intra(p):
            n += 1
    assert n == sum(1 for p in plans
                    if frame_compatible(p) and frame_has_intra(p))
    assert n > 0


def test_scan_perm_invariants(force_scan):
    """Every intra TU appears in exactly one slot; slots within a band
    are z-scan-ordered per tile (decode order = the kernel's serial
    correctness contract)."""
    from libde265_tpu.frame_program import stream_cfg, frame_has_intra, \
        frame_compatible
    from libde265_tpu.intra_fused import (pack_intra, _avail_grids,
                                          assign_levels_meta)
    plans = _parse(os.path.join(DATA, "p_cif_mixed.bin"))
    cfg = stream_cfg(plans, plans[0].sps)
    assert cfg.intra_scan
    KL, KC = cfg.intra_scan[:2]
    for plan in plans:
        if not (frame_compatible(plan) and frame_has_intra(plan)):
            continue
        t = pack_intra(plan, cfg)
        tm = plan._tu_arrays[0]
        lv = assign_levels_meta(plan)
        zg = _avail_grids(plan)[0]
        ctb = 1 << plan.sps.Log2CtbSizeY
        lcls = [e[1] for e in cfg.intra if e[0] == 0]
        perm = t["ispm_0"]
        n_luma = int(((lv > 0) & (tm[:, 0] == 0)).sum())
        valid = perm[perm >= 0]
        assert valid.size == n_luma
        assert np.unique(valid).size == n_luma      # each TU once
        # within each band: zg strictly increasing among same-tile TUs
        for band in range(perm.size // KL):
            rows = perm[band * KL:(band + 1) * KL]
            rows = rows[rows >= 0]
            last = -1
            for v in rows:
                log2 = lcls[v & 3]
                # row -> original TU: re-derive x,y from the packed xy
                xy = t[f"ixy_0_{log2}"][v >> 2]
                x, y = int(xy[0]), int(xy[1])
                assert y // ctb == band
                z = int(zg[y >> 2, x >> 2])
                assert z > last, "slots out of decode order"
                last = z
