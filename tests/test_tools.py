"""Smoke tests for the CLI/debugging tools."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "data")


def test_sherlock_report(tmp_path):
    """tools/sherlock.py writes a self-contained HTML player with all
    overlay layers embedded (sherlock265 counterpart)."""
    out = tmp_path / "rep.html"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "sherlock.py"),
         os.path.join(DATA, "p_cif_mixed.bin"), "-o", str(out), "-n", "2"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    html = out.read_text()
    for needle in ('id="fr"', 'ck_cb', 'ck_mv', '"base"', 'image/png'):
        assert needle in html, needle


def test_api_peek_release_pts_chroma():
    """de265 API surface: peek/release pairing, PTS propagation, and
    chroma-format query (de265.h:166-294)."""
    import sys
    sys.path.insert(0, REPO)
    from libde265_tpu.api import (new_decoder, peek_next_picture,
                                  release_next_picture, get_next_picture)
    with open(os.path.join(DATA, "intra_64x64_q27.bin"), "rb") as f:
        data = f.read()
    dec = new_decoder()
    dec.push_data(data, pts=77000)
    dec.flush()
    while dec.decode():
        pass
    p = peek_next_picture(dec)
    assert p is not None and p.pts == 77000 and p.chroma_format == 1
    assert peek_next_picture(dec).poc == p.poc    # peek does not consume
    n = 0
    while peek_next_picture(dec) is not None:     # release consumes
        release_next_picture(dec)
        n += 1
    assert n >= 1 and peek_next_picture(dec) is None
    # mono stream reports chroma_format 0
    from libde265_tpu.api import decode_stream_native
    with open(os.path.join(DATA, "rext_mono_104x72.bin"), "rb") as f:
        pics = decode_stream_native(f.read())
    assert pics[0].chroma_format == 0
    with open(os.path.join(DATA, "rext_422_104x72.bin"), "rb") as f:
        pics = decode_stream_native(f.read())
    assert pics[0].chroma_format == 2
