#!/usr/bin/env python3
"""Generate inter (P-frame) test vectors with our own encoder, using the
reference decoder (.ref_build/dec265) as the golden oracle.

Rationale: the reference's experimental encoder hangs in its inter RDO on
non-trivial content (observed: infinite loop in enc265 for low-delay streams),
so inter coverage comes from our en265-equivalent encoder whose output is
validated through dec265 — decoded YUV + per-plane MD5s land in
tests/data/manifest_inter.json.
"""
import hashlib
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DEC = os.path.join(REPO, ".ref_build", "dec265", "dec265")
DATA = os.path.join(REPO, "tests", "data")

from libde265_tpu.encoder import Encoder, EncoderConfig  # noqa: E402


def make_frames10(n, w, h, seed=5):
    rng = np.random.RandomState(seed)
    gy, gx = np.mgrid[0:h, 0:w]
    base = np.clip(400 + 250 * np.sin(gx / 7.0) * np.cos(gy / 9.0)
                   + rng.randint(0, 120, (h, w)), 0, 1023).astype(np.uint16)
    out = []
    for t in range(n):
        y = np.roll(base, (t * 2, t * 3), (0, 1))
        u = np.clip(512 + 200 * np.sin(np.mgrid[0:h//2, 0:w//2][1] / 5.0 + t),
                    0, 1023).astype(np.uint16)
        v = np.clip(512 + 200 * np.cos(np.mgrid[0:h//2, 0:w//2][0] / 6.0),
                    0, 1023).astype(np.uint16)
        out.append([y, u, v])
    return out


def make_frames(n, w, h, seed=3):
    rng = np.random.RandomState(seed)
    gy, gx = np.mgrid[0:h, 0:w]
    base = np.clip(100 + 60 * np.sin(gx / 7.0) * np.cos(gy / 9.0)
                   + rng.randint(0, 30, (h, w)), 0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        y = np.roll(base, (t * 2, t * 3), (0, 1))
        u = np.clip(128 + 50 * np.sin(np.mgrid[0:h//2, 0:w//2][1] / 5.0 + t * .3),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 50 * np.cos(np.mgrid[0:h//2, 0:w//2][0] / 6.0),
                    0, 255).astype(np.uint8)
        frames.append([y, u, v])
    return frames


CASES = [
    # name, w, h, nframes, config kwargs
    ("p_skip", 64, 64, 4, dict(inter_mode="skip")),
    ("p_mv", 64, 64, 4, dict(inter_mode="mv")),
    ("p_mvres", 64, 64, 4, dict(inter_mode="mv", inter_residual=True)),
    ("p_mixed", 64, 64, 4, dict(inter_mode="mixed", inter_residual=True)),
    ("p_deblk", 64, 64, 4, dict(inter_mode="mixed", inter_residual=True,
                                disable_deblocking=False)),
    ("p_sao", 64, 64, 4, dict(inter_mode="mixed", inter_residual=True, sao=True)),
    ("p_filters", 64, 64, 4, dict(inter_mode="mixed", inter_residual=True,
                                  disable_deblocking=False, sao=True)),
    ("p_2ref", 64, 64, 4, dict(inter_mode="mv", num_ref_l0=2)),
    ("p_tmvp", 64, 64, 4, dict(inter_mode="mixed", temporal_mvp=True)),
    ("p_wp", 64, 64, 4, dict(inter_mode="mv", weighted_pred=True,
                             luma_weight_delta=10, luma_offset=5)),
    ("p_bigmv", 64, 64, 4, dict(inter_mode="mv", mv_patterns=(
        (33, 17), (-40, -25), (121, 3), (1, 2), (3, 1), (2, 3), (-65, 77), (7, -7)))),
    # CU 16 with Log2MaxTrafoSize 8: every inter residual CU codes a
    # SPLIT transform tree (inferred split, per-leaf cbf) — the only
    # stream class reaching the inter split-TT syntax paths
    ("p_ttsplit", 64, 64, 4, dict(inter_mode="mv", inter_residual=True,
                                  log2_max_tb=3, num_ref_l0=2)),
    # two-PU inter CUs: 2NxN/Nx2N explicit-AMVP pairs — reaches the
    # multi-PU motion paths incl. same-CB AMVP neighbour availability
    ("p_2pu", 64, 64, 4, dict(inter_mode="2pu", num_ref_l0=2)),
    ("p_2pu_amp", 64, 64, 4, dict(inter_mode="2pu", amp=True,
                                  temporal_mvp=True)),
    ("p_2pu_merge", 64, 64, 4, dict(inter_mode="2pu", two_pu_merge=True,
                                    num_ref_l0=2)),
    ("b_2pu_merge", 64, 64, 4, dict(inter_mode="2pu", two_pu_merge=True,
                                    b_frames=True)),
    # PB-boundary deblocking: bS-1 edges from MV deltas ACROSS the PU
    # split inside a CU (deblock.cc:281-352) + SAO on top
    ("p_2pu_filters", 64, 64, 4, dict(inter_mode="2pu", num_ref_l0=2,
                                      disable_deblocking=False, sao=True)),
    # sign data hiding: the first-in-scan sign inferred from level-sum
    # parity per sub-block (7.4.9.11) — intra and inter residuals
    ("p_sdh", 64, 64, 4, dict(inter_mode="mixed", inter_residual=True,
                              sign_data_hiding=True)),
    # transform-skip 4x4 TUs (intra luma via NxN + chroma at CU8)
    ("i_tskip_nxn", 64, 64, 2, dict(cu_log2=3, nxn_intra=True,
                                    transform_skip=True, intra_period=1)),
    ("p_tskip", 64, 64, 4, dict(inter_mode="mixed", inter_residual=True,
                                cu_log2=3, transform_skip=True)),
    # per-CU adaptive QP (cu_qp_delta + 8.6.1 prediction), with the QP
    # map feeding deblock thresholds
    ("p_qpdelta", 64, 64, 4, dict(inter_mode="mixed", inter_residual=True,
                                  cu_qp_delta=True, cu_log2=5,
                                  disable_deblocking=False)),
    # PPS chroma QP offsets; 32x32 strong intra smoothing; constrained
    # intra prediction (border substitution from non-intra neighbours)
    ("p_qpoff", 64, 64, 3, dict(cb_qp_offset=3, cr_qp_offset=-4,
                                inter_mode="mixed", inter_residual=True)),
    ("i_strong32", 64, 64, 2, dict(cu_log2=5, intra_period=1,
                                   strong_intra_smoothing=True)),
    ("p_cip", 64, 64, 4, dict(constrained_intra=True, inter_mode="mixed",
                              inter_residual=True)),
    # ref_pic_lists_modification: reversed RPS order (8.3.4)
    ("p_reflist_mod", 64, 64, 5, dict(ref_list_reverse=True, num_ref_l0=3,
                                      inter_mode="mv", inter_residual=True)),
    ("b_reflist_mod", 64, 64, 5, dict(ref_list_reverse=True, num_ref_l0=3,
                                      inter_mode="mixed",
                                      inter_residual=True, b_frames=True)),
    # mvd_l1_zero_flag: BI PUs infer L1 mvd = (0,0) without coding it
    # (7.4.7.1 / slice.cc read_prediction_unit)
    ("b_mvdl1zero", 64, 64, 4, dict(mvd_l1_zero=True, inter_mode="mv",
                                    inter_residual=True, b_frames=True)),
    # cabac_init_flag: swapped P/B context init tables (9.3.2.2)
    ("p_cabacinit", 64, 64, 3, dict(cabac_init=True, inter_mode="mixed",
                                    inter_residual=True)),
    ("b_cabacinit", 64, 64, 3, dict(cabac_init=True, inter_mode="mixed",
                                    inter_residual=True, b_frames=True)),
    ("p_cu8", 64, 64, 3, dict(inter_mode="mixed", inter_residual=True, cu_log2=3)),
    ("p_cif_mixed", 128, 96, 3, dict(inter_mode="mixed", inter_residual=True,
                                     disable_deblocking=False, sao=True,
                                     temporal_mvp=True)),
    ("i_deblk_sao", 64, 64, 2, dict(intra_period=1, disable_deblocking=False,
                                    sao=True)),
    # parallelism structures (WPP / tiles / multi-slice)
    ("p_wppx", 96, 96, 3, dict(wpp=True, inter_mode="mixed", inter_residual=True)),
    ("p_tiles22", 128, 96, 3, dict(tiles=(2, 2), inter_mode="mixed",
                                   inter_residual=True)),
    ("p_slices2", 96, 96, 3, dict(num_slices=2, inter_mode="mixed",
                                  inter_residual=True)),
    ("p_slices2wpp", 96, 96, 3, dict(num_slices=2, wpp=True, inter_mode="mixed",
                                     inter_residual=True)),
    ("p_tiles_nolf", 128, 64, 2, dict(tiles=(2, 1), lf_across_tiles=False,
                                      disable_deblocking=False,
                                      inter_mode="mixed", inter_residual=True)),
    ("p_hash_sei", 64, 64, 3, dict(inter_mode="mixed", inter_residual=True,
                                   write_hash_sei=True)),
    ("p_scaling", 64, 64, 3, dict(inter_mode="mixed", inter_residual=True,
                                  scaling_lists=True)),
    ("p_tqbypass", 64, 64, 3, dict(inter_mode="mixed", inter_residual=True,
                                   tq_bypass=True)),
    ("p_depslices", 96, 96, 3, dict(inter_mode="mixed", inter_residual=True,
                                    num_slices=3, dependent_slices=True)),
    ("b_mixed", 64, 64, 4, dict(inter_mode="mixed", inter_residual=True,
                                b_frames=True, num_ref_l0=2, temporal_mvp=True)),
    ("b_mv", 64, 64, 4, dict(inter_mode="mv", b_frames=True, num_ref_l0=2)),
    ("p_10bit", 64, 64, 3, dict(inter_mode="mixed", inter_residual=True,
                                bit_depth=10)),
    ("p_pcm", 64, 64, 3, dict(inter_mode="mixed", inter_residual=True,
                              pcm=True)),
    ("p_pcm_nolf", 64, 64, 3, dict(inter_mode="mixed", inter_residual=True,
                                   pcm=True, pcm_loop_filter_disable=True,
                                   disable_deblocking=False, sao=True)),
    ("p_cra", 64, 64, 6, dict(inter_mode="mixed", inter_residual=True,
                              intra_period=3, use_cra=True)),
    ("p_ltr", 64, 64, 6, dict(inter_mode="mixed", inter_residual=True,
                              use_ltr=True, num_ref_l0=1)),
    ("p_temporal", 64, 64, 6, dict(inter_mode="mixed", inter_residual=True,
                                   temporal_layers=True)),
    # per-slice filter-flag variation: slice 0 SAO-only, slice 1 deblock-only
    ("p_mixedlf", 96, 96, 3, dict(inter_mode="mixed", inter_residual=True,
                                  num_slices=2, mixed_filter_slices=True,
                                  sao=True, disable_deblocking=False)),
]


def plane_md5s(yuv_path, w, h, frames, bytes_per_sample=1):
    out = []
    fsz = (w * h + 2 * (w // 2) * (h // 2)) * bytes_per_sample
    data = open(yuv_path, "rb").read()
    assert len(data) == fsz * frames
    bps = bytes_per_sample
    for t in range(frames):
        b = t * fsz
        out.append({
            "y": hashlib.md5(data[b:b + w*h*bps]).hexdigest(),
            "u": hashlib.md5(data[b + w*h*bps:b + w*h*bps + (w//2)*(h//2)*bps]).hexdigest(),
            "v": hashlib.md5(data[b + w*h*bps + (w//2)*(h//2)*bps:b + fsz]).hexdigest(),
        })
    return out


def main():
    os.makedirs(DATA, exist_ok=True)
    only = set(sys.argv[1:])          # regenerate just the named cases
    path = os.path.join(DATA, "manifest_inter.json")
    manifest = json.load(open(path)) if (only and os.path.exists(path)) \
        else {}
    for name, w, h, nf, kw in CASES:
        if only and name not in only:
            continue
        cfg = EncoderConfig(width=w, height=h, qp=30, **kw)
        enc = Encoder(cfg)
        gen = make_frames10 if kw.get("bit_depth", 8) > 8 else make_frames
        stream = enc.encode(gen(nf, w, h))
        bit = os.path.join(DATA, f"{name}.bin")
        gold = os.path.join(DATA, f"{name}_gold.yuv")
        open(bit, "wb").write(stream)
        r = subprocess.run([DEC, "-q", "-o", gold, bit], capture_output=True,
                           text=True, timeout=300)
        assert r.returncode == 0, (name, r.stderr)
        bps = 2 if kw.get("bit_depth", 8) > 8 else 1
        manifest[name] = {"w": w, "h": h, "frames": nf,
                          "md5": plane_md5s(gold, w, h, nf, bps),
                          "bit_depth": kw.get("bit_depth", 8),
                          "size_bytes": len(stream)}
        print(f"{name}: {len(stream)} bytes")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
