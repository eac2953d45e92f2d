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
