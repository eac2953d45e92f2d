#!/usr/bin/env python3
"""Diff our CABAC bin stream against the trace-enabled reference decoder.

The reference logs three kinds of decode events:
  [N] decodeBin ... / -> bit B          (context bin)
  [N] bypass ...    / -> bit B          (single bypass bin)
  [N] bypass group ... (nBits=k) / -> value V   (k bypass bins at once)
plus decode_CABAC_term_bit (logged as TERM below if present).
We expand groups into individual bits and compare the full ordered sequence.

Usage: python tools/trace_diff.py stream.bin [--ref-dec PATH]
"""
import re
import subprocess
import sys

sys.path.insert(0, ".")


def ref_events(stream_path):
    out = subprocess.run([".ref_trace/dec265/dec265", "-v", "-v", "-v", "-q",
                          stream_path], capture_output=True, text=True,
                         timeout=3600).stdout
    lines = out.splitlines()
    events = []  # (kind, bit, line_idx)
    i = 0
    n = len(lines)
    while i < n:
        ln = lines[i]
        m = re.match(r"\[\s*\d+\] (decodeBin|bypass group|bypass|termbit)", ln)
        if m:
            kind = m.group(1)
            # find following result line
            for j in range(i + 1, min(i + 5, n)):
                mb = re.match(r"\[\s*\d+\] -> bit (\d+)", lines[j])
                mv = re.match(r"\[\s*\d+\] -> value (\d+)", lines[j])
                if mb and kind == "decodeBin":
                    events.append(("b", int(mb.group(1)), i))
                    i = j
                    break
                if mb and kind == "bypass":
                    events.append(("y", int(mb.group(1)), i))
                    i = j
                    break
                if mb and kind == "termbit":
                    events.append(("t", int(mb.group(1)), i))
                    i = j
                    break
                if mv and kind == "bypass group":
                    nb = int(re.search(r"nBits=(\d+)", ln).group(1))
                    v = int(mv.group(1))
                    for k in range(nb - 1, -1, -1):
                        events.append(("y", (v >> k) & 1, i))
                    i = j
                    break
        i += 1
    return events, lines


def my_trace(stream_path):
    trace = []
    from libde265_tpu.bitstream.cabac import CabacDecoder
    orig = CabacDecoder.__init__

    def newinit(self, data, start_byte=0):
        orig(self, data, start_byte)
        self.trace = trace
    CabacDecoder.__init__ = newinit
    from libde265_tpu.api import decode_stream
    try:
        decode_stream(open(stream_path, "rb").read())
    except Exception as e:
        print("EXCEPTION during decode:", repr(e))
    CabacDecoder.__init__ = orig
    return trace


def main():
    path = sys.argv[1]
    rev, rlines = ref_events(path)
    mine = my_trace(path)
    # ref may not log term bits; filter mine accordingly if needed
    ref_has_term = any(k == "t" for k, _, _ in rev)
    mine_f = mine if ref_has_term else [m for m in mine if m[0] != "t"]
    print(f"ref events: {len(rev)}, mine: {len(mine_f)} (raw {len(mine)})")
    nn = min(len(rev), len(mine_f))
    for i in range(nn):
        rk, rb, li = rev[i]
        m = mine_f[i]
        if (rk, rb) != (m[0], m[1]):
            print(f"DIVERGE at event {i}: ref=({rk},{rb}) mine={m}")
            print("--- ref context ---")
            for ln in rlines[max(0, li - 14):li + 4]:
                print(" ", ln)
            print("--- mine around ---")
            for k in range(max(0, i - 5), min(nn, i + 3)):
                print(" ", k, mine_f[k])
            return 1
    print(f"all {nn} common events match (ref {len(rev)} mine {len(mine_f)})")
    if len(rev) != len(mine_f):
        print("LENGTH MISMATCH")
        li = rev[min(nn, len(rev) - 1)][2]
        for ln in rlines[max(0, li - 8):li + 8]:
            print(" ", ln)


if __name__ == "__main__":
    sys.exit(main())
