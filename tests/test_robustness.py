"""Stream-robustness: corrupted/truncated inputs must produce warnings,
concealment or clean errors — never an exception (reference strategy: AFL
fuzz corpora + corrupted-input guards, slice.cc:4709-4716, decctx.cc:2226).
Also covers de265_reset-style seeking and RASL dropping."""
import json
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def _streams():
    out = []
    for man in ("manifest.json", "manifest_inter.json",
                "manifest_rext.json"):
        with open(os.path.join(DATA, man)) as f:
            for name in json.load(f):
                out.append(name)
    return out


def _load(name):
    with open(os.path.join(DATA, name + ".bin"), "rb") as f:
        return f.read()


def _decode_tolerant(stream):
    """Full decode; returns decoder. Any exception = test failure."""
    from libde265_tpu.api import new_decoder, get_next_picture
    dec = new_decoder()
    dec.push_data(stream)
    dec.flush()
    while dec.decode():
        while get_next_picture(dec) is not None:
            pass
    while get_next_picture(dec) is not None:
        pass
    return dec


def test_truncated_streams_never_crash():
    for name in _streams():
        data = _load(name)
        for frac in (0.25, 0.5, 0.75, 0.9):
            _decode_tolerant(data[:int(len(data) * frac)])


def test_bitflipped_streams_never_crash():
    rng = np.random.RandomState(7)
    for name in _streams():
        data = bytearray(_load(name))
        for trial in range(3):
            corrupt = bytearray(data)
            for _ in range(4):
                pos = rng.randint(8, len(corrupt))   # keep VPS start intact
                corrupt[pos] ^= 1 << rng.randint(8)
            _decode_tolerant(bytes(corrupt))


def test_garbage_and_empty():
    _decode_tolerant(b"")
    _decode_tolerant(b"\x00\x00\x01\xff\xffgarbage")
    _decode_tolerant(os.urandom(512))
    _decode_tolerant(b"\x00\x00\x00\x01" + os.urandom(64))


def test_dependent_slice_first_is_clean():
    """A stream starting with a dependent slice segment (independent
    predecessor missing) must warn, not crash."""
    from libde265_tpu.errors import Warning as W
    data = _load("p_depslices")
    # find the 3rd slice NAL (a dependent one) and splice stream to start
    # with parameter sets + that NAL
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.encoder.cabac_enc import add_emulation_prevention as ep
    units = list(split_annexb(data))
    ps = [u for u in units if u.header.nal_unit_type in (32, 33, 34)]
    dep = [u for u in units if u.header.nal_unit_type < 32][2]
    blob = b"".join(b"\x00\x00\x00\x01" + ep(u.data) for u in ps) + \
        b"\x00\x00\x00\x01" + ep(dep.data)
    dec = _decode_tolerant(blob)
    codes = set()
    while True:
        w = dec.get_warning()
        if w is None:
            break
        codes.add(w)
    assert codes  # warned something (dependent-without-independent or similar)


def test_reset_then_seek():
    """Decode a prefix, reset, then decode from a random-access point."""
    from libde265_tpu.api import new_decoder, get_next_picture
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.encoder.cabac_enc import add_emulation_prevention as ep
    name = "p_cra"   # IDR ... CRA at intra_period=3
    m = json.load(open(os.path.join(DATA, "manifest_inter.json")))[name]
    data = _load(name)
    dec = new_decoder()
    dec.push_data(data[:len(data) // 2])
    while dec.decode():
        pass
    dec.reset()
    # seek: feed parameter sets + stream from the CRA
    units = list(split_annexb(data))
    ps = [u for u in units if u.header.nal_unit_type in (32, 33, 34)]
    vcl = [u for u in units if u.header.nal_unit_type < 32]
    cra_i = next(i for i, u in enumerate(vcl) if u.header.nal_unit_type == 21)
    blob = b"".join(b"\x00\x00\x00\x01" + ep(u.data) for u in ps)
    blob += b"".join(b"\x00\x00\x00\x01" + ep(u.data) for u in vcl[cra_i:])
    dec.push_data(blob)
    dec.flush()
    got = []
    while dec.decode():
        p = get_next_picture(dec)
        if p:
            got.append(p)
    while True:
        p = get_next_picture(dec)
        if p is None:
            break
        got.append(p)
    # frames from the CRA onward must be bit-exact (golden tail)
    n_tail = m["frames"] - cra_i
    assert len(got) == n_tail
    for i, pic in enumerate(got):
        want = [m["md5"][cra_i + i][k] for k in "yuv"]
        assert [pic.plane_md5(c) for c in range(3)] == want


def test_dpb_overflow_recovers():
    """Feed the same IDR-less picture headers repeatedly so references
    accumulate; decoder must keep going via drop_oldest_reference."""
    from libde265_tpu.api import new_decoder
    data = _load("p_mixed")
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.encoder.cabac_enc import add_emulation_prevention as ep
    units = list(split_annexb(data))
    ps = [u for u in units if u.header.nal_unit_type in (32, 33, 34)]
    vcl = [u for u in units if u.header.nal_unit_type < 32]
    blob = b"".join(b"\x00\x00\x00\x01" + ep(u.data) for u in ps)
    blob += b"".join(b"\x00\x00\x00\x01" + ep(u.data) for u in vcl)
    # repeat the non-IDR part many times without letting output drain slots
    tail = b"".join(b"\x00\x00\x00\x01" + ep(u.data) for u in vcl[1:])
    blob += tail * 15
    dec = new_decoder()
    dec.push_data(blob)
    dec.flush()
    while dec.decode():
        pass


def _relabel(nal_data: bytes, new_type: int) -> bytes:
    b = bytearray(nal_data)
    b[0] = (b[0] & 0x81) | (new_type << 1)
    return bytes(b)


def test_rasl_after_seek_is_dropped():
    """Seek to a CRA; a following picture relabeled RASL_R must be skipped
    (NoRaslOutputFlag=1), later pictures concealed, no crash."""
    from libde265_tpu.api import new_decoder, get_next_picture
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.encoder.cabac_enc import add_emulation_prevention as ep
    from libde265_tpu.errors import Warning as W
    data = _load("p_cra")
    units = list(split_annexb(data))
    ps = [u for u in units if u.header.nal_unit_type in (32, 33, 34)]
    vcl = [u for u in units if u.header.nal_unit_type < 32]
    cra_i = next(i for i, u in enumerate(vcl) if u.header.nal_unit_type == 21)
    blob = b"".join(b"\x00\x00\x00\x01" + ep(u.data) for u in ps)
    tail = vcl[cra_i:]
    for i, u in enumerate(tail):
        d = u.data
        if i == 1:
            d = _relabel(d, 9)    # RASL_R
        blob += b"\x00\x00\x00\x01" + ep(d)
    dec = new_decoder()
    dec.push_data(blob)
    dec.flush()
    n = 0
    while dec.decode():
        while get_next_picture(dec) is not None:
            n += 1
    while get_next_picture(dec) is not None:
        n += 1
    codes = []
    while True:
        w = dec.get_warning()
        if w is None:
            break
        codes.append(w)
    assert W.RASL_PICTURE_SKIPPED in codes
    assert n == len(tail) - 1     # the RASL picture was not output


def test_bla_resets_prediction_chain():
    """Relabel a mid-stream CRA as BLA_W_LP: references must be cleared and
    decode must continue cleanly (concealment allowed, no crash)."""
    from libde265_tpu.api import new_decoder, get_next_picture
    from libde265_tpu.bitstream.nal import split_annexb
    from libde265_tpu.encoder.cabac_enc import add_emulation_prevention as ep
    data = _load("p_cra")
    units = list(split_annexb(data))
    blob = b""
    for u in units:
        d = u.data
        if u.header.nal_unit_type == 21:
            d = _relabel(d, 16)   # BLA_W_LP
        blob += b"\x00\x00\x00\x01" + ep(d)
    dec = new_decoder()
    dec.push_data(blob)
    dec.flush()
    n = 0
    while dec.decode():
        while get_next_picture(dec) is not None:
            n += 1
    while get_next_picture(dec) is not None:
        n += 1
    assert n >= 1


def test_warning_queue_api():
    from libde265_tpu.errors import WarningQueue, Warning as W
    q = WarningQueue()
    q.add(W.SLICE_DATA_CORRUPTED, "x")
    q.add(W.RASL_PICTURE_SKIPPED)
    q.add(W.RASL_PICTURE_SKIPPED)   # once-only: deduped
    assert q.get() == W.SLICE_DATA_CORRUPTED
    assert q.get() == W.RASL_PICTURE_SKIPPED
    assert q.get() is None
    for _ in range(100):
        q.add(W.SLICE_DATA_CORRUPTED)
    assert len(q.queue) <= WarningQueue.MAX
