#!/usr/bin/env python3
"""hdrcopy: parse an HEVC stream's headers and dump / re-emit them.

Capability counterpart of reference dec265/hdrcopy.cc (which reads a
bitstream and re-writes its headers through the encoder-side writer).
Here: parses VPS/SPS/PPS/slice headers with the decoder-side parsers and
prints a field dump; --copy re-emits the parameter-set NALs byte-exactly
(unstuffed payload round-trip) into a new file.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from libde265_tpu.bitstream.nal import split_annexb  # noqa: E402
from libde265_tpu.bitstream.paramsets import (  # noqa: E402
    read_vps, read_sps, read_pps)
from libde265_tpu.bitstream.sliceheader import read_slice_header  # noqa: E402
from libde265_tpu.encoder.cabac_enc import add_emulation_prevention  # noqa: E402

NAL_NAMES = {0: "TRAIL_N", 1: "TRAIL_R", 2: "TSA_N", 3: "TSA_R",
             16: "BLA_W_LP", 17: "BLA_W_RADL", 18: "BLA_N_LP",
             19: "IDR_W_RADL", 20: "IDR_N_LP", 21: "CRA_NUT",
             32: "VPS", 33: "SPS", 34: "PPS", 35: "AUD",
             39: "PREFIX_SEI", 40: "SUFFIX_SEI"}


def dump_obj(name, obj, keys):
    print(f"----------------- {name} -----------------")
    for k in keys:
        if hasattr(obj, k):
            print(f"{k:40s}: {getattr(obj, k)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream")
    ap.add_argument("--copy", help="write parameter-set NALs to this file")
    ap.add_argument("--slices", action="store_true",
                    help="also dump slice headers")
    args = ap.parse_args()

    data = open(args.stream, "rb").read()
    spss, ppss = {}, {}
    out = bytearray()
    for u in split_annexb(data):
        t = u.header.nal_unit_type
        name = NAL_NAMES.get(t, str(t))
        if t == 32:
            v = read_vps(u.data)
            dump_obj(f"VPS {name}", v, [
                "video_parameter_set_id", "max_sub_layers",
                "temporal_id_nesting_flag", "max_dec_pic_buffering",
                "max_num_reorder_pics"])
            out += b"\x00\x00\x00\x01" + add_emulation_prevention(u.data)
        elif t == 33:
            s = read_sps(u.data)
            spss[s.seq_parameter_set_id] = s
            dump_obj(f"SPS {name}", s, [
                "seq_parameter_set_id", "chroma_format_idc",
                "pic_width_in_luma_samples", "pic_height_in_luma_samples",
                "bit_depth_luma", "bit_depth_chroma",
                "log2_max_pic_order_cnt_lsb", "max_sub_layers",
                "log2_min_luma_coding_block_size",
                "log2_diff_max_min_luma_coding_block_size",
                "sample_adaptive_offset_enabled_flag",
                "pcm_enabled_flag", "sps_temporal_mvp_enabled_flag",
                "strong_intra_smoothing_enabled_flag",
                "scaling_list_enable_flag", "amp_enabled_flag",
                "long_term_ref_pics_present_flag"])
            if s.vui is not None:
                dump_obj("VUI", s.vui, [
                    "sar_width", "sar_height", "timing_info_present",
                    "num_units_in_tick", "time_scale",
                    "video_full_range_flag", "colour_primaries",
                    "transfer_characteristics", "matrix_coeffs"])
                if s.vui.frame_rate:
                    print(f"{'frame_rate':40s}: {s.vui.frame_rate:.3f}")
            out += b"\x00\x00\x00\x01" + add_emulation_prevention(u.data)
        elif t == 34:
            p = read_pps(u.data, spss)
            ppss[p.pic_parameter_set_id] = p
            dump_obj(f"PPS {name}", p, [
                "pic_parameter_set_id", "sps_id", "dependent_slice_segments_enabled_flag",
                "cabac_init_present_flag", "num_ref_idx_l0_default_active",
                "num_ref_idx_l1_default_active", "init_qp",
                "cu_qp_delta_enabled_flag", "diff_cu_qp_delta_depth",
                "pps_cb_qp_offset", "pps_cr_qp_offset",
                "weighted_pred_flag", "weighted_bipred_flag",
                "transquant_bypass_enable_flag", "tiles_enabled_flag",
                "entropy_coding_sync_enabled_flag", "sign_data_hiding_flag",
                "transform_skip_enabled_flag",
                "loop_filter_across_slices_enabled_flag"])
            out += b"\x00\x00\x00\x01" + add_emulation_prevention(u.data)
        elif t <= 31 and args.slices and ppss:
            try:
                sh = read_slice_header(u.data, u.header, ppss, spss)
                dump_obj(f"slice {name}", sh, [
                    "slice_type", "slice_pic_order_cnt_lsb",
                    "first_slice_segment_in_pic_flag",
                    "dependent_slice_segment_flag", "slice_qp",
                    "num_ref_idx_l0_active", "num_ref_idx_l1_active",
                    "slice_temporal_mvp_enabled_flag", "five_minus_max_num_merge_cand"])
            except Exception as e:  # keep dumping on damaged slices
                print(f"slice {name}: <parse failed: {e}>")

    if args.copy:
        open(args.copy, "wb").write(bytes(out))
        print(f"wrote {len(out)} bytes of parameter sets to {args.copy}")


if __name__ == "__main__":
    main()
