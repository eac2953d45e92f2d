"""Slice segment header parsing (spec 7.3.6).

Capability counterpart of /root/reference/libde265/slice.h:129-263 +
slice.cc:356-880 (read), incl. ref-list modification, pred-weight table and
entry-point offsets.
"""
from dataclasses import dataclass, field
from typing import List, Optional

from .bitreader import Bitreader
from . import nal as nal_mod
from .paramsets import read_short_term_rps, ShortTermRPS

SLICE_TYPE_B = 0
SLICE_TYPE_P = 1
SLICE_TYPE_I = 2


@dataclass
class PredWeight:
    luma_log2_weight_denom: int = 0
    chroma_log2_weight_denom: int = 0
    # per list, per ref idx
    luma_weight: list = field(default_factory=lambda: [[], []])
    luma_offset: list = field(default_factory=lambda: [[], []])
    chroma_weight: list = field(default_factory=lambda: [[], []])  # [l][i][2]
    chroma_offset: list = field(default_factory=lambda: [[], []])


@dataclass
class SliceHeader:
    nal_unit_type: int = 0
    nuh_temporal_id: int = 0
    first_slice_segment_in_pic_flag: int = 0
    no_output_of_prior_pics_flag: int = 0
    pic_parameter_set_id: int = 0
    dependent_slice_segment_flag: int = 0
    slice_segment_address: int = 0
    slice_type: int = SLICE_TYPE_I
    pic_output_flag: int = 1
    colour_plane_id: int = 0
    slice_pic_order_cnt_lsb: int = 0
    short_term_ref_pic_set_sps_flag: int = 1
    slice_rps: Optional[ShortTermRPS] = None
    short_term_ref_pic_set_idx: int = 0
    num_long_term_sps: int = 0
    num_long_term_pics: int = 0
    lt_idx_sps: List[int] = field(default_factory=list)
    poc_lsb_lt: List[int] = field(default_factory=list)
    used_by_curr_pic_lt_flag: List[int] = field(default_factory=list)
    delta_poc_msb_present_flag: List[int] = field(default_factory=list)
    delta_poc_msb_cycle_lt: List[int] = field(default_factory=list)
    slice_temporal_mvp_enabled_flag: int = 0
    slice_sao_luma_flag: int = 0
    slice_sao_chroma_flag: int = 0
    num_ref_idx_l0_active: int = 0
    num_ref_idx_l1_active: int = 0
    ref_pic_list_modification_flag_l0: int = 0
    ref_pic_list_modification_flag_l1: int = 0
    list_entry_l0: List[int] = field(default_factory=list)
    list_entry_l1: List[int] = field(default_factory=list)
    mvd_l1_zero_flag: int = 0
    cabac_init_flag: int = 0
    collocated_from_l0_flag: int = 1
    collocated_ref_idx: int = 0
    pred_weight: Optional[PredWeight] = None
    five_minus_max_num_merge_cand: int = 0
    slice_qp_delta: int = 0
    slice_cb_qp_offset: int = 0
    slice_cr_qp_offset: int = 0
    cu_chroma_qp_offset_enabled_flag: int = 0
    deblocking_filter_override_flag: int = 0
    slice_deblocking_filter_disabled_flag: int = 0
    slice_beta_offset: int = 0
    slice_tc_offset: int = 0
    slice_loop_filter_across_slices_enabled_flag: int = 0
    num_entry_point_offsets: int = 0
    entry_point_offsets: List[int] = field(default_factory=list)
    header_size_bytes: int = 0  # byte offset where slice data starts (post-alignment)

    # derived
    SliceQPY: int = 26
    MaxNumMergeCand: int = 5
    initType: int = 0
    CurrRpsIdx: int = 0

    def is_intra(self):
        return self.slice_type == SLICE_TYPE_I


def read_slice_header(data: bytes, hdr: "nal_mod.NALHeader", pps_map, sps_map) -> SliceHeader:
    br = Bitreader(data[2:])
    sh = SliceHeader()
    sh.nal_unit_type = hdr.nal_unit_type
    sh.nuh_temporal_id = hdr.nuh_temporal_id
    sh.first_slice_segment_in_pic_flag = br.get_bits(1)
    if nal_mod.is_rap(hdr.nal_unit_type):
        sh.no_output_of_prior_pics_flag = br.get_bits(1)
    sh.pic_parameter_set_id = br.get_uvlc()
    pps = pps_map[sh.pic_parameter_set_id]
    sps = pps.sps
    if not sh.first_slice_segment_in_pic_flag:
        if pps.dependent_slice_segments_enabled_flag:
            sh.dependent_slice_segment_flag = br.get_bits(1)
        bits = (sps.PicSizeInCtbsY - 1).bit_length()
        sh.slice_segment_address = br.get_bits(bits)
    if not sh.dependent_slice_segment_flag:
        for _ in range(pps.num_extra_slice_header_bits):
            br.skip_bits(1)
        sh.slice_type = br.get_uvlc()
        if pps.output_flag_present_flag:
            sh.pic_output_flag = br.get_bits(1)
        if sps.separate_colour_plane_flag:
            sh.colour_plane_id = br.get_bits(2)
        if not nal_mod.is_idr(hdr.nal_unit_type):
            sh.slice_pic_order_cnt_lsb = br.get_bits(sps.log2_max_pic_order_cnt_lsb)
            sh.short_term_ref_pic_set_sps_flag = br.get_bits(1)
            if not sh.short_term_ref_pic_set_sps_flag:
                sh.slice_rps = read_short_term_rps(
                    br, sps.ref_pic_sets, len(sps.ref_pic_sets),
                    len(sps.ref_pic_sets), slice_header=True)
                sh.CurrRpsIdx = len(sps.ref_pic_sets)
            elif len(sps.ref_pic_sets) > 1:
                bits = (len(sps.ref_pic_sets) - 1).bit_length()
                sh.short_term_ref_pic_set_idx = br.get_bits(bits)
                sh.CurrRpsIdx = sh.short_term_ref_pic_set_idx
            else:
                sh.CurrRpsIdx = 0
            if sps.long_term_ref_pics_present_flag:
                if sps.num_long_term_ref_pics_sps > 0:
                    sh.num_long_term_sps = br.get_uvlc()
                sh.num_long_term_pics = br.get_uvlc()
                for i in range(sh.num_long_term_sps + sh.num_long_term_pics):
                    if i < sh.num_long_term_sps:
                        if sps.num_long_term_ref_pics_sps > 1:
                            bits = (sps.num_long_term_ref_pics_sps - 1).bit_length()
                            sh.lt_idx_sps.append(br.get_bits(bits))
                        else:
                            sh.lt_idx_sps.append(0)
                        sh.poc_lsb_lt.append(sps.lt_ref_pic_poc_lsb_sps[sh.lt_idx_sps[-1]])
                        sh.used_by_curr_pic_lt_flag.append(
                            sps.used_by_curr_pic_lt_sps_flag[sh.lt_idx_sps[-1]])
                    else:
                        sh.poc_lsb_lt.append(br.get_bits(sps.log2_max_pic_order_cnt_lsb))
                        sh.used_by_curr_pic_lt_flag.append(br.get_bits(1))
                    sh.delta_poc_msb_present_flag.append(br.get_bits(1))
                    if sh.delta_poc_msb_present_flag[-1]:
                        sh.delta_poc_msb_cycle_lt.append(br.get_uvlc())
                    else:
                        sh.delta_poc_msb_cycle_lt.append(0)
            if sps.sps_temporal_mvp_enabled_flag:
                sh.slice_temporal_mvp_enabled_flag = br.get_bits(1)
        if sps.sample_adaptive_offset_enabled_flag:
            sh.slice_sao_luma_flag = br.get_bits(1)
            if sps.ChromaArrayType != 0:
                sh.slice_sao_chroma_flag = br.get_bits(1)
        if sh.slice_type in (SLICE_TYPE_P, SLICE_TYPE_B):
            _read_ref_lists(br, sh, pps, sps)
            if sh.slice_type == SLICE_TYPE_B:
                sh.mvd_l1_zero_flag = br.get_bits(1)
            if pps.cabac_init_present_flag:
                sh.cabac_init_flag = br.get_bits(1)
            if sh.slice_temporal_mvp_enabled_flag:
                if sh.slice_type == SLICE_TYPE_B:
                    sh.collocated_from_l0_flag = br.get_bits(1)
                nactive = (sh.num_ref_idx_l0_active if sh.collocated_from_l0_flag
                           else sh.num_ref_idx_l1_active)
                if nactive > 1:
                    sh.collocated_ref_idx = br.get_uvlc()
            if (pps.weighted_pred_flag and sh.slice_type == SLICE_TYPE_P) or \
               (pps.weighted_bipred_flag and sh.slice_type == SLICE_TYPE_B):
                sh.pred_weight = _read_pred_weight_table(br, sh, sps)
            sh.five_minus_max_num_merge_cand = br.get_uvlc()
            sh.MaxNumMergeCand = 5 - sh.five_minus_max_num_merge_cand
        sh.slice_qp_delta = br.get_svlc()
        if pps.pps_slice_chroma_qp_offsets_present_flag:
            sh.slice_cb_qp_offset = br.get_svlc()
            sh.slice_cr_qp_offset = br.get_svlc()
        if pps.chroma_qp_offset_list_enabled_flag:
            sh.cu_chroma_qp_offset_enabled_flag = br.get_bits(1)
        if pps.deblocking_filter_control_present_flag:
            if pps.deblocking_filter_override_enabled_flag:
                sh.deblocking_filter_override_flag = br.get_bits(1)
            if sh.deblocking_filter_override_flag:
                sh.slice_deblocking_filter_disabled_flag = br.get_bits(1)
                if not sh.slice_deblocking_filter_disabled_flag:
                    sh.slice_beta_offset = br.get_svlc() * 2
                    sh.slice_tc_offset = br.get_svlc() * 2
            else:
                sh.slice_deblocking_filter_disabled_flag = pps.pic_disable_deblocking_filter_flag
                sh.slice_beta_offset = pps.beta_offset
                sh.slice_tc_offset = pps.tc_offset
        else:
            sh.slice_beta_offset = pps.beta_offset
            sh.slice_tc_offset = pps.tc_offset
        if (sh.slice_sao_luma_flag or sh.slice_sao_chroma_flag
                or not sh.slice_deblocking_filter_disabled_flag):
            if pps.pps_loop_filter_across_slices_enabled_flag:
                sh.slice_loop_filter_across_slices_enabled_flag = br.get_bits(1)
        else:
            sh.slice_loop_filter_across_slices_enabled_flag = \
                pps.pps_loop_filter_across_slices_enabled_flag
    if pps.tiles_enabled_flag or pps.entropy_coding_sync_enabled_flag:
        sh.num_entry_point_offsets = br.get_uvlc()
        if sh.num_entry_point_offsets > 0:
            offset_len = br.get_uvlc() + 1
            for _ in range(sh.num_entry_point_offsets):
                sh.entry_point_offsets.append(br.get_bits(offset_len) + 1)
    if pps.slice_segment_header_extension_present_flag:
        ext_len = br.get_uvlc()
        br.skip_bits(8 * ext_len)
    # byte_alignment()
    if br.get_bit() != 1:
        raise ValueError("missing alignment_bit_equal_to_one in slice header")
    br.byte_align()
    sh.header_size_bytes = 2 + (br.pos >> 3)  # + NAL header bytes
    # derived
    sh.SliceQPY = pps.pic_init_qp + sh.slice_qp_delta
    if sh.slice_type == SLICE_TYPE_I:
        sh.initType = 0
    elif sh.slice_type == SLICE_TYPE_P:
        sh.initType = 2 if sh.cabac_init_flag else 1
    else:
        sh.initType = 1 if sh.cabac_init_flag else 2
    return sh


def _read_ref_lists(br, sh, pps, sps):
    sh.num_ref_idx_l0_active = pps.num_ref_idx_l0_default_active
    sh.num_ref_idx_l1_active = pps.num_ref_idx_l1_default_active
    override = br.get_bits(1)
    if override:
        sh.num_ref_idx_l0_active = br.get_uvlc() + 1
        if sh.slice_type == SLICE_TYPE_B:
            sh.num_ref_idx_l1_active = br.get_uvlc() + 1
    # NumPicTotalCurr (spec 7.4.7.2) needed for list modification presence
    if pps.lists_modification_present_flag:
        num_total = _num_pic_total_curr(sh, sps)
        if num_total > 1:
            bits = max(1, (num_total - 1).bit_length())
            sh.ref_pic_list_modification_flag_l0 = br.get_bits(1)
            if sh.ref_pic_list_modification_flag_l0:
                for _ in range(sh.num_ref_idx_l0_active):
                    sh.list_entry_l0.append(br.get_bits(bits))
            if sh.slice_type == SLICE_TYPE_B:
                sh.ref_pic_list_modification_flag_l1 = br.get_bits(1)
                if sh.ref_pic_list_modification_flag_l1:
                    for _ in range(sh.num_ref_idx_l1_active):
                        sh.list_entry_l1.append(br.get_bits(bits))


def _num_pic_total_curr(sh, sps):
    rps = sh.slice_rps if sh.slice_rps is not None else \
        (sps.ref_pic_sets[sh.CurrRpsIdx] if sh.CurrRpsIdx < len(sps.ref_pic_sets)
         else ShortTermRPS())
    n = sum(1 for u in rps.used_s0 if u) + sum(1 for u in rps.used_s1 if u)
    n += sum(1 for u in sh.used_by_curr_pic_lt_flag if u)
    return n


def _read_pred_weight_table(br, sh, sps):
    """spec 7.3.6.3."""
    pw = PredWeight()
    pw.luma_log2_weight_denom = br.get_uvlc()
    if sps.ChromaArrayType != 0:
        pw.chroma_log2_weight_denom = pw.luma_log2_weight_denom + br.get_svlc()
    nlists = 2 if sh.slice_type == SLICE_TYPE_B else 1
    nactive = [sh.num_ref_idx_l0_active, sh.num_ref_idx_l1_active]
    for l in range(nlists):
        n = nactive[l]
        luma_flags = [br.get_bits(1) for _ in range(n)]
        chroma_flags = [0] * n
        if sps.ChromaArrayType != 0:
            chroma_flags = [br.get_bits(1) for _ in range(n)]
        for i in range(n):
            if luma_flags[i]:
                w = (1 << pw.luma_log2_weight_denom) + br.get_svlc()
                o = br.get_svlc()
            else:
                w, o = (1 << pw.luma_log2_weight_denom), 0
            pw.luma_weight[l].append(w)
            pw.luma_offset[l].append(o)
            cw, co = [], []
            for c in range(2):
                if chroma_flags[i]:
                    dw = br.get_svlc()
                    do = br.get_svlc()
                    w_c = (1 << pw.chroma_log2_weight_denom) + dw
                    # spec 7.4.6.3: ChromaOffset = Clip3(-128,127,
                    #   128 + delta - ((128*w) >> ChromaLog2WeightDenom))
                    o_c = _clip3(-128, 127,
                                 (128 + do) - ((128 * w_c) >> pw.chroma_log2_weight_denom))
                else:
                    w_c, o_c = (1 << pw.chroma_log2_weight_denom), 0
                cw.append(w_c)
                co.append(o_c)
            pw.chroma_weight[l].append(cw)
            pw.chroma_offset[l].append(co)
    return pw


def _clip3(lo, hi, v):
    return lo if v < lo else hi if v > hi else v
