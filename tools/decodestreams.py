#!/usr/bin/env python3
"""Conformance-sweep driver (counterpart of
/root/reference/scripts/decodestreams.py): decodes every stream in a
directory through our decoder with SEI-hash / manifest MD5 checking, using a
process pool; corrupted-input files (prefix 'id_' like AFL corpora) are
allowed to fail but must not crash the interpreter."""
import json
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_one(task):
    name, path, md5s = task
    try:
        from libde265_tpu.api import decode_stream_native
        pics = decode_stream_native(open(path, "rb").read())
        if md5s is not None:
            if len(pics) != len(md5s):
                return (name, f"FRAMES {len(pics)}/{len(md5s)}")
            for i, p in enumerate(pics):
                keys = [k for k in "yuv" if k in md5s[i]]   # mono: y only
                got = [p.plane_md5(c) for c in range(len(keys))]
                want = [md5s[i][k] for k in keys]
                if got != want:
                    return (name, f"MD5 MISMATCH frame {i}")
        return (name, "OK")
    except Exception as e:
        if os.path.basename(path).startswith("id_"):
            return (name, f"FUZZ-FAIL (allowed): {e!r:.60}")
        return (name, f"EXC {e!r:.80}")


def main():
    data = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", "data")
    manifests = {}
    for mf in ("manifest.json", "manifest_inter.json",
               "manifest_big.json", "manifest_rext.json"):
        p = os.path.join(data, mf)
        if os.path.exists(p):
            manifests.update(json.load(open(p)))
    tasks = []
    for fn in sorted(os.listdir(data)):
        if not fn.endswith(".bin"):
            continue
        name = fn[:-4]
        md5s = manifests.get(name, {}).get("md5")
        tasks.append((name, os.path.join(data, fn), md5s))
    with mp.Pool(min(4, mp.cpu_count())) as pool:
        results = pool.map(check_one, tasks)
    fails = [r for r in results if not r[1].startswith(("OK", "FUZZ"))]
    for name, status in results:
        print(f"{name}: {status}")
    print(f"\n{len(results) - len(fails)}/{len(results)} streams OK")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
