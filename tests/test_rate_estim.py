"""CABAC rate-estimator accuracy (counterpart of the reference's
CABAC_encoder_estim, libde265/cabac.cc, and tools/gen-entropy-table.cc)."""
import random

from libde265_tpu.encoder.cabac_enc import CabacEncoder
from libde265_tpu.encoder.rate_estim import CabacEstimator, ENTROPY_TABLE


def test_entropy_table_shape():
    assert len(ENTROPY_TABLE) == 64
    # state 0 is ~1 bit either way; high states: cheap MPS, expensive LPS
    assert abs(ENTROPY_TABLE[0][0] / 0x8000 - 1.0) < 0.1
    assert ENTROPY_TABLE[62][0] / 0x8000 < 0.1
    assert ENTROPY_TABLE[62][1] / 0x8000 > 4.0


def test_estimator_tracks_real_bits():
    """Estimated bits within 1% of the real arithmetic coder on adapting
    contexts mixed with bypass bins."""
    rng = random.Random(5)
    enc, est = CabacEncoder(), CabacEstimator()
    ctxs_e = [[rng.randrange(60), rng.getrandbits(1)] for _ in range(8)]
    ctxs_s = [list(c) for c in ctxs_e]
    for _ in range(30000):
        if rng.randrange(10) < 7:
            j = rng.randrange(8)
            b = ctxs_e[j][1] if rng.random() < 0.8 else 1 - ctxs_e[j][1]
            enc.encode_bin(ctxs_e[j], b)
            est.encode_bin(ctxs_s[j], b)
        else:
            b = rng.getrandbits(1)
            enc.encode_bypass(b)
            est.encode_bypass(b)
    enc.encode_terminate(1)
    real = len(enc.data()) * 8
    assert abs(est.bits - real) / real < 0.01
    # context states stayed in lockstep
    assert ctxs_e == ctxs_s


def test_hdrcopy_tool(tmp_path, capsys):
    """hdrcopy dump + parameter-set copy round-trips (counterpart of
    reference dec265/hdrcopy.cc)."""
    import os
    import subprocess
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "tests", "data", "p_temporal.bin")
    out = str(tmp_path / "ps.bin")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "hdrcopy.py"),
         src, "--slices", "--copy", out],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "SPS" in r.stdout and "PPS" in r.stdout and "slice" in r.stdout
    assert "max_sub_layers" in r.stdout
    data = open(out, "rb").read()
    # the copied parameter sets must parse again
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.bitstream.paramsets import read_sps, read_pps
    spss = {}
    types = []
    for u in split_annexb(data):
        t = u.header.nal_unit_type
        types.append(t)
        if t == 33:
            s = read_sps(u.data)
            spss[s.seq_parameter_set_id] = s
        elif t == 34:
            read_pps(u.data, spss)
    assert 33 in types and 34 in types
