"""GOP-level parallel decode: split an Annex-B stream at IRAP boundaries and
decode the segments concurrently.

This is the multi-host scaling axis from SURVEY §5: random-access points
(IDR/BLA/CRA) are natural checkpoint/shard boundaries — each GOP is fully
self-contained (the reference leaves frame-level parallelism as a TODO,
decctx.cc:904-910). Workers are processes here (one per host/chip in a pod
deployment); frames/s scaling is measured by tools/bench_gop.py.
"""
import multiprocessing as mp
import os

from ..bitstream.nal import split_annexb, is_idr, is_bla, is_cra, is_vcl


def split_gops(stream: bytes):
    """Split an Annex-B stream into self-contained segments, each starting
    with the parameter sets + one IRAP. Returns list of byte strings."""
    # find start-code positions + nal types
    units = []
    i = 0
    n = len(stream)
    while True:
        j = stream.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        start = j - 1 if j > 0 and stream[j - 1] == 0 else j
        k = stream.find(b"\x00\x00\x01", j + 3)
        end = n if k < 0 else (k - 1 if stream[k - 1] == 0 else k)
        t = (stream[j + 3] >> 1) & 0x3F
        units.append((t, start, end))
        i = j + 3
    # parameter sets prefix
    ps = b"".join(stream[s:e] for (t, s, e) in units if t in (32, 33, 34))
    gops = []
    cur = bytearray()
    for (t, s, e) in units:
        if t in (32, 33, 34):
            continue
        if is_vcl(t) and (is_idr(t) or is_bla(t) or is_cra(t)):
            if cur:
                gops.append(bytes(cur))
            cur = bytearray()
        cur += stream[s:e]
    if cur:
        gops.append(bytes(cur))
    return [ps + g for g in gops]


def _decode_gop(args):
    idx, seg, native = args
    if native:
        from ..api import decode_stream_native as ds
    else:
        from ..api import decode_stream as ds
    pics = ds(seg)
    return idx, [(p.poc, p.to_yuv_bytes()) for p in pics]


def decode_gop_parallel(stream: bytes, workers: int = None, native: bool = True):
    """Decode GOPs concurrently; returns frames in presentation order.
    workers defaults to cpu count (stands in for per-host workers on a pod)."""
    gops = split_gops(stream)
    if len(gops) <= 1:
        return _decode_gop((0, gops[0] if gops else stream, native))[1]
    workers = workers or min(len(gops), mp.cpu_count())
    with mp.Pool(workers) as pool:
        results = pool.map(_decode_gop, [(i, g, native) for i, g in enumerate(gops)])
    results.sort(key=lambda r: r[0])
    out = []
    for _, frames in results:
        out.extend(frames)
    return out
