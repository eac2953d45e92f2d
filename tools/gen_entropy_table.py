#!/usr/bin/env python3
"""Generate the CABAC rate-estimation entropy table.

Capability counterpart of reference tools/gen-entropy-table.cc
(generate_entropy_table_replay): measure the *marginal* cost in output bits
of coding one extra bin with a context in state s (MPS or LPS), by
injecting probe bins into a long background stream of random bins and
comparing the resulting bitstream sizes. The resulting Q15 fixed-point
table feeds encoder/rate_estim.py (counterpart of CABAC_encoder_estim,
reference libde265/cabac.cc entropy_table).
"""
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from libde265_tpu.encoder.cabac_enc import CabacEncoder  # noqa: E402


def measure(n_background=400_000, oversample=10, seed=3):
    rng = random.Random(seed)
    # one shared background bin schedule: (state, bit, is_bypass)
    background = []
    for _ in range(n_background):
        if rng.random() < 0.2:
            background.append((64, rng.getrandbits(1)))      # bypass
        else:
            background.append((rng.randrange(64), rng.getrandbits(1)))
    rows = []
    for s in range(64):
        encs = {"ref": CabacEncoder(), "mps": CabacEncoder(),
                "lps": CabacEncoder()}
        n_probe = 0
        for i, (st, b) in enumerate(background):
            for e in encs.values():
                if st == 64:
                    e.encode_bypass(b)
                else:
                    e.encode_bin([st, 1], b)   # fresh ctx: isolate the probe
            if i % oversample == oversample // 2:
                encs["mps"].encode_bin([s, 1], 1)   # MPS bin (bit==mps)
                encs["lps"].encode_bin([s, 1], 0)   # LPS bin
                n_probe += 1
        sizes = {}
        for k, e in encs.items():
            e.encode_terminate(1)
            sizes[k] = len(e.data()) * 8
        bps_mps = (sizes["mps"] - sizes["ref"]) / n_probe
        bps_lps = (sizes["lps"] - sizes["ref"]) / n_probe
        rows.append((max(bps_mps, 1e-4), max(bps_lps, 1e-4)))
    return rows


def main():
    rows = measure()
    print("# (MPS bits, LPS bits) per state, Q15 fixed point")
    print("ENTROPY_TABLE = [")
    for s, (m, l) in enumerate(rows):
        print(f"    (0x{int(m * 0x8000):05x}, 0x{int(l * 0x8000):05x}),"
              f"  # state {s}: {m:.4f} / {l:.4f}")
    print("]")


if __name__ == "__main__":
    main()
