#!/usr/bin/env python3
"""Same-machine, same-stream reference comparison: run the reference
decoder (dec265, built -O3 from /root/reference) over the committed bench
streams at 1 and 4 threads and record its fps alongside our most recent
device numbers. BASELINE.md's published numbers (284/150/36 fps) came
from a 2012 i7-2700K on Tears-of-Steel-class content; this artifact pins
the apples-to-apples comparison on THIS machine and THIS content.

Writes REFCOMP.json. Usage: python tools/ref_compare.py
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEC = os.path.join(REPO, ".ref_build", "dec265", "dec265")
DATA = os.path.join(REPO, "tests", "data")

STREAMS = ["gop1080p", "ld4k_light", "ld4k", "ld_1080p_wpp", "ld_720p_wpp",
           "ld720p_light", "ld1080p_light",
           # WPP-encoded bench-bitrate streams: dec265 -t4 threads these
           # (fair same-machine comparison, VERDICT r3 item 6)
           "ld1080p_light_wppb", "ld4k_light_wppb"]


def main():
    if not os.path.exists(DEC):
        sys.exit("build the reference first: cmake -S /root/reference "
                 "-B .ref_build -G Ninja && cmake --build .ref_build")
    with open(os.path.join(DATA, "manifest_big.json")) as f:
        man = json.load(f)
    out = {"host": " ".join(open("/proc/cpuinfo").read().split(
        "model name\t: ")[1].splitlines()[:1]) if os.path.exists(
        "/proc/cpuinfo") else "?", "ncpu": os.cpu_count(), "streams": {}}
    for s in STREAMS:
        path = os.path.join(DATA, s + ".bin")
        if not os.path.exists(path) or s not in man:
            continue
        m = man[s]
        row = {"w": m["w"], "h": m["h"], "frames": m["frames"],
               "mbps": round(m["size_bytes"] * 8 * 30 / m["frames"] / 1e6,
                             1)}
        for t in (1, 4):
            r = subprocess.run([DEC, "-q", "-t", str(t), path],
                               capture_output=True, text=True, timeout=1800)
            fm = re.search(r"@\s+([0-9.]+) fps", r.stdout + r.stderr)
            row[f"dec265_t{t}_fps"] = float(fm.group(1)) if fm else None
        wpp = "Cannot run decoder multi-threaded" in (r.stdout + r.stderr)
        row["dec265_threadable"] = not wpp
        out["streams"][s] = row
        print(s, row, flush=True)
    out["note"] = ("dec265 -q fps on this machine; compare with "
                   "BENCH_r*.json (device decode) and FRONTEND.json "
                   "(parse). Published README numbers used an i7-2700K "
                   "@3.5GHz on Tears of Steel; these cores are slower "
                   "and the bench content's bitrate differs.")
    with open(os.path.join(REPO, "REFCOMP.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote REFCOMP.json")


if __name__ == "__main__":
    main()
