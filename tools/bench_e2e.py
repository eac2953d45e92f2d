#!/usr/bin/env python3
"""End-to-end decode benchmark on a real stream: native C++ front-end +
selected reconstruction backend. Prints per-stage timings and fps.

Usage: python tools/bench_e2e.py stream.bin [numpy|device] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    except Exception:
        pass
    path = sys.argv[1]
    backend = sys.argv[2] if len(sys.argv) > 2 else "device"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    data = open(path, "rb").read()
    from libde265_tpu.api import decode_stream_native
    # warmup (compiles cached)
    pics = decode_stream_native(data, backend=backend)
    n = len(pics)
    t0 = time.time()
    for _ in range(iters):
        pics = decode_stream_native(data, backend=backend)
    dt = (time.time() - t0) / iters
    print(f"{os.path.basename(path)}: {n} frames, backend={backend}: "
          f"{dt:.3f} s/stream = {n / dt:.2f} fps "
          f"({pics[0].width}x{pics[0].height})")


if __name__ == "__main__":
    sys.exit(main())
