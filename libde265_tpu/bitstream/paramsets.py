"""VPS / SPS / PPS / profile-tier-level / scaling list parsing (spec 7.3.2).

Capability counterpart of /root/reference/libde265/{vps,sps,pps}.{h,cc};
written from the H.265 syntax tables. Derived geometry (CTB grid, min-block
grids, tile boundaries, raster<->tile-scan maps) mirrors what the reference
derives in sps.h:190 (compute_derived_values) and pps.h:159 (set_derived_values)
because downstream decode logic needs exactly those quantities.
"""
from dataclasses import dataclass, field
from typing import List, Optional

from .bitreader import Bitreader


# --------------------------------------------------------------------------
@dataclass
class ProfileTierLevel:
    general_profile_space: int = 0
    general_tier_flag: int = 0
    general_profile_idc: int = 0
    general_profile_compatibility_flags: int = 0
    general_level_idc: int = 0
    sub_layer_info: list = field(default_factory=list)


def read_profile_tier_level(br: Bitreader, max_sublayers: int) -> ProfileTierLevel:
    ptl = ProfileTierLevel()
    ptl.general_profile_space = br.get_bits(2)
    ptl.general_tier_flag = br.get_bits(1)
    ptl.general_profile_idc = br.get_bits(5)
    ptl.general_profile_compatibility_flags = br.get_bits(32)
    br.skip_bits(48)  # constraint flags + reserved
    ptl.general_level_idc = br.get_bits(8)
    sub_profile_present = []
    sub_level_present = []
    for _ in range(max_sublayers - 1):
        sub_profile_present.append(br.get_bits(1))
        sub_level_present.append(br.get_bits(1))
    if max_sublayers > 1:
        for _ in range(max_sublayers - 1, 8):
            br.skip_bits(2)
    for i in range(max_sublayers - 1):
        if sub_profile_present[i]:
            br.skip_bits(2 + 1 + 5 + 32 + 48)
        if sub_level_present[i]:
            br.skip_bits(8)
    return ptl


# --------------------------------------------------------------------------
@dataclass
class VPS:
    video_parameter_set_id: int = 0
    max_layers: int = 1
    max_sub_layers: int = 1
    temporal_id_nesting_flag: int = 0
    profile_tier_level: Optional[ProfileTierLevel] = None


def read_vps(data: bytes) -> VPS:
    br = Bitreader(data[2:])  # skip 2-byte NAL header
    v = VPS()
    v.video_parameter_set_id = br.get_bits(4)
    br.skip_bits(2)  # reserved
    v.max_layers = br.get_bits(6) + 1
    v.max_sub_layers = br.get_bits(3) + 1
    v.temporal_id_nesting_flag = br.get_bits(1)
    br.skip_bits(16)  # reserved 0xffff
    v.profile_tier_level = read_profile_tier_level(br, v.max_sub_layers)
    # the rest (sub-layer ordering, layer sets, timing) is not needed for decode
    return v


# --------------------------------------------------------------------------
# Scaling lists (spec 7.3.4 / 7.4.5)

# default scaling lists (spec Tables 7-5, 7-6)
DEFAULT_SCALING_4x4 = [16] * 16
DEFAULT_SCALING_8x8_INTRA = [
    16, 16, 16, 16, 17, 18, 21, 24,
    16, 16, 16, 16, 17, 19, 22, 25,
    16, 16, 17, 18, 20, 22, 25, 29,
    16, 16, 18, 21, 24, 27, 31, 36,
    17, 17, 20, 24, 30, 35, 41, 47,
    18, 19, 22, 27, 35, 44, 54, 65,
    21, 22, 25, 31, 41, 54, 70, 88,
    24, 25, 29, 36, 47, 65, 88, 115,
]
DEFAULT_SCALING_8x8_INTER = [
    16, 16, 16, 16, 17, 18, 20, 24,
    16, 16, 16, 17, 18, 20, 24, 25,
    16, 16, 17, 18, 20, 24, 25, 28,
    16, 17, 18, 20, 24, 25, 28, 33,
    17, 18, 20, 24, 25, 28, 33, 41,
    18, 20, 24, 25, 28, 33, 41, 54,
    20, 24, 25, 28, 33, 41, 54, 71,
    24, 25, 28, 33, 41, 54, 71, 91,
]


@dataclass
class ScalingList:
    """matrices[sizeId][matrixId] -> flat list (raster order),
    dc[sizeId-2][matrixId] for 16x16/32x32."""
    m4: list = field(default_factory=list)   # [6][16]
    m8: list = field(default_factory=list)   # [6][64]
    m16: list = field(default_factory=list)  # [6][64] (8x8 coded, upsampled later)
    m32: list = field(default_factory=list)  # [2][64]
    dc16: list = field(default_factory=lambda: [16] * 6)
    dc32: list = field(default_factory=lambda: [16] * 2)

    @staticmethod
    def default():
        sl = ScalingList()
        sl.m4 = [list(DEFAULT_SCALING_4x4) for _ in range(6)]
        sl.m8 = [list(DEFAULT_SCALING_8x8_INTRA) if i < 3 else list(DEFAULT_SCALING_8x8_INTER)
                 for i in range(6)]
        sl.m16 = [list(DEFAULT_SCALING_8x8_INTRA) if i < 3 else list(DEFAULT_SCALING_8x8_INTER)
                  for i in range(6)]
        sl.m32 = [list(DEFAULT_SCALING_8x8_INTRA), list(DEFAULT_SCALING_8x8_INTER)]
        return sl


def read_scaling_list_data(br: Bitreader) -> ScalingList:
    """spec 7.3.4 scaling_list_data()."""
    from .scan import diag_scan
    sl = ScalingList.default()
    for size_id in range(4):
        n_mat = 6 if size_id != 3 else 2
        for matrix_id in range(n_mat):
            pred_mode_flag = br.get_bits(1)
            if not pred_mode_flag:
                # predicted: scaling_list_pred_matrix_id_delta
                delta = br.get_uvlc()
                if delta == 0:
                    _copy_default(sl, size_id, matrix_id)
                else:
                    ref_id = matrix_id - delta * (3 if size_id == 3 else 1)
                    _copy_from(sl, size_id, matrix_id, ref_id)
            else:
                # explicitly coded, diagonal scan of 4x4 or 8x8 base matrix
                coefs = 16 if size_id == 0 else 64
                next_coef = 8
                dc = 8
                if size_id > 1:
                    dc = br.get_svlc() + 8
                    next_coef = dc
                side = 4 if size_id == 0 else 8
                scan = diag_scan(side, side)
                flat = [0] * coefs
                for i in range(coefs):
                    d = br.get_svlc()
                    next_coef = (next_coef + d + 256) % 256
                    x, y = scan[i]
                    flat[y * side + x] = next_coef
                _store_sl(sl, size_id, matrix_id, flat, dc)
    return sl


def _get_mat(sl, size_id):
    return (sl.m4, sl.m8, sl.m16, sl.m32)[size_id]


def _store_sl(sl, size_id, matrix_id, flat, dc):
    _get_mat(sl, size_id)[matrix_id] = flat
    if size_id == 2:
        sl.dc16[matrix_id] = dc
    elif size_id == 3:
        sl.dc32[matrix_id] = dc


def _copy_default(sl, size_id, matrix_id):
    if size_id == 0:
        sl.m4[matrix_id] = list(DEFAULT_SCALING_4x4)
    else:
        src = DEFAULT_SCALING_8x8_INTRA if (matrix_id < 3 if size_id != 3 else matrix_id < 1) \
            else DEFAULT_SCALING_8x8_INTER
        _get_mat(sl, size_id)[matrix_id] = list(src)
        if size_id == 2:
            sl.dc16[matrix_id] = 16
        elif size_id == 3:
            sl.dc32[matrix_id] = 16


def _copy_from(sl, size_id, matrix_id, ref_id):
    mat = _get_mat(sl, size_id)
    mat[matrix_id] = list(mat[ref_id])
    if size_id == 2:
        sl.dc16[matrix_id] = sl.dc16[ref_id]
    elif size_id == 3:
        sl.dc32[matrix_id] = sl.dc32[ref_id]


# --------------------------------------------------------------------------
# Short-term reference picture sets (spec 7.3.7 / 7.4.8)

@dataclass
class ShortTermRPS:
    num_negative: int = 0
    num_positive: int = 0
    delta_poc_s0: List[int] = field(default_factory=list)  # negative deltas (DeltaPocS0)
    delta_poc_s1: List[int] = field(default_factory=list)
    used_s0: List[bool] = field(default_factory=list)
    used_s1: List[bool] = field(default_factory=list)


def read_short_term_rps(br: Bitreader, rps_list: List[ShortTermRPS], idx: int,
                        num_sets: int, slice_header: bool = False) -> ShortTermRPS:
    rps = ShortTermRPS()
    inter_pred = 0
    if idx != 0:
        inter_pred = br.get_bits(1)
    if inter_pred:
        if slice_header and idx == num_sets:
            delta_idx = br.get_uvlc() + 1
        else:
            delta_idx = 1
        ref = rps_list[idx - delta_idx]
        delta_rps_sign = br.get_bits(1)
        abs_delta_rps = br.get_uvlc() + 1
        delta_rps = (1 - 2 * delta_rps_sign) * abs_delta_rps
        nref = ref.num_negative + ref.num_positive
        used = []
        use_delta = []
        for j in range(nref + 1):
            u = br.get_bits(1)
            used.append(u)
            if not u:
                use_delta.append(br.get_bits(1))
            else:
                use_delta.append(1)
        # derive (spec 7.4.8 equations 7-47..7-50)
        ref_d0 = ref.delta_poc_s0
        ref_d1 = ref.delta_poc_s1
        # S0 (negative)
        d0, u0 = [], []
        for j in range(ref.num_positive - 1, -1, -1):
            d = ref_d1[j] + delta_rps
            if d < 0 and use_delta[ref.num_negative + j]:
                d0.append(d)
                u0.append(bool(used[ref.num_negative + j]))
        if delta_rps < 0 and use_delta[nref]:
            d0.append(delta_rps)
            u0.append(bool(used[nref]))
        for j in range(ref.num_negative):
            d = ref_d0[j] + delta_rps
            if d < 0 and use_delta[j]:
                d0.append(d)
                u0.append(bool(used[j]))
        # S1 (positive)
        d1, u1 = [], []
        for j in range(ref.num_negative - 1, -1, -1):
            d = ref_d0[j] + delta_rps
            if d > 0 and use_delta[j]:
                d1.append(d)
                u1.append(bool(used[j]))
        if delta_rps > 0 and use_delta[nref]:
            d1.append(delta_rps)
            u1.append(bool(used[nref]))
        for j in range(ref.num_positive):
            d = ref_d1[j] + delta_rps
            if d > 0 and use_delta[ref.num_negative + j]:
                d1.append(d)
                u1.append(bool(used[ref.num_negative + j]))
        rps.delta_poc_s0, rps.used_s0 = d0, u0
        rps.delta_poc_s1, rps.used_s1 = d1, u1
        rps.num_negative, rps.num_positive = len(d0), len(d1)
    else:
        rps.num_negative = br.get_uvlc()
        rps.num_positive = br.get_uvlc()
        last = 0
        for _ in range(rps.num_negative):
            d = br.get_uvlc() + 1
            last -= d
            rps.delta_poc_s0.append(last)
            rps.used_s0.append(bool(br.get_bits(1)))
        last = 0
        for _ in range(rps.num_positive):
            d = br.get_uvlc() + 1
            last += d
            rps.delta_poc_s1.append(last)
            rps.used_s1.append(bool(br.get_bits(1)))
    return rps


# --------------------------------------------------------------------------
@dataclass
class SPS:
    video_parameter_set_id: int = 0
    vui: object = None                  # VUI if vui_parameters_present
    max_sub_layers: int = 1
    temporal_id_nesting_flag: int = 0
    profile_tier_level: Optional[ProfileTierLevel] = None
    seq_parameter_set_id: int = 0
    chroma_format_idc: int = 1
    separate_colour_plane_flag: int = 0
    pic_width_in_luma_samples: int = 0
    pic_height_in_luma_samples: int = 0
    conformance_window_flag: int = 0
    conf_win_left_offset: int = 0
    conf_win_right_offset: int = 0
    conf_win_top_offset: int = 0
    conf_win_bottom_offset: int = 0
    bit_depth_luma: int = 8
    bit_depth_chroma: int = 8
    log2_max_pic_order_cnt_lsb: int = 8
    sps_sub_layer_ordering_info_present_flag: int = 0
    max_dec_pic_buffering: List[int] = field(default_factory=list)
    max_num_reorder_pics: List[int] = field(default_factory=list)
    max_latency_increase: List[int] = field(default_factory=list)
    log2_min_luma_coding_block_size: int = 3
    log2_diff_max_min_luma_coding_block_size: int = 0
    log2_min_transform_block_size: int = 2
    log2_diff_max_min_transform_block_size: int = 0
    max_transform_hierarchy_depth_inter: int = 0
    max_transform_hierarchy_depth_intra: int = 0
    scaling_list_enable_flag: int = 0
    scaling_list: Optional[ScalingList] = None
    amp_enabled_flag: int = 0
    sample_adaptive_offset_enabled_flag: int = 0
    pcm_enabled_flag: int = 0
    pcm_sample_bit_depth_luma: int = 8
    pcm_sample_bit_depth_chroma: int = 8
    log2_min_pcm_luma_coding_block_size: int = 3
    log2_diff_max_min_pcm_luma_coding_block_size: int = 0
    pcm_loop_filter_disable_flag: int = 0
    ref_pic_sets: List[ShortTermRPS] = field(default_factory=list)
    long_term_ref_pics_present_flag: int = 0
    num_long_term_ref_pics_sps: int = 0
    lt_ref_pic_poc_lsb_sps: List[int] = field(default_factory=list)
    used_by_curr_pic_lt_sps_flag: List[int] = field(default_factory=list)
    sps_temporal_mvp_enabled_flag: int = 0
    strong_intra_smoothing_enable_flag: int = 0
    vui_present: int = 0
    range_extension: bool = False
    # range extension flags (all 0 for Main)
    transform_skip_rotation_enabled_flag: int = 0
    transform_skip_context_enabled_flag: int = 0
    implicit_rdpcm_enabled_flag: int = 0
    explicit_rdpcm_enabled_flag: int = 0
    extended_precision_processing_flag: int = 0
    intra_smoothing_disabled_flag: int = 0
    high_precision_offsets_enabled_flag: int = 0
    persistent_rice_adaptation_enabled_flag: int = 0
    cabac_bypass_alignment_enabled_flag: int = 0

    # ---- derived values (mirror of sps.h:190 compute_derived_values) ----
    def derive(self):
        self.ChromaArrayType = 0 if self.separate_colour_plane_flag else self.chroma_format_idc
        self.SubWidthC = 2 if self.chroma_format_idc in (1, 2) else 1
        self.SubHeightC = 2 if self.chroma_format_idc == 1 else 1
        self.BitDepthY = self.bit_depth_luma
        self.BitDepthC = self.bit_depth_chroma
        self.Log2MinCbSizeY = self.log2_min_luma_coding_block_size
        self.Log2CtbSizeY = self.Log2MinCbSizeY + self.log2_diff_max_min_luma_coding_block_size
        self.MinCbSizeY = 1 << self.Log2MinCbSizeY
        self.CtbSizeY = 1 << self.Log2CtbSizeY
        self.PicWidthInMinCbsY = self.pic_width_in_luma_samples // self.MinCbSizeY
        self.PicWidthInCtbsY = -(-self.pic_width_in_luma_samples // self.CtbSizeY)
        self.PicHeightInMinCbsY = self.pic_height_in_luma_samples // self.MinCbSizeY
        self.PicHeightInCtbsY = -(-self.pic_height_in_luma_samples // self.CtbSizeY)
        self.PicSizeInMinCbsY = self.PicWidthInMinCbsY * self.PicHeightInMinCbsY
        self.PicSizeInCtbsY = self.PicWidthInCtbsY * self.PicHeightInCtbsY
        self.Log2MinTrafoSize = self.log2_min_transform_block_size
        self.Log2MaxTrafoSize = (self.log2_min_transform_block_size
                                 + self.log2_diff_max_min_transform_block_size)
        self.Log2MinPUSize = self.Log2MinCbSizeY - 1
        self.PicWidthInMinPUs = -(-self.pic_width_in_luma_samples // (1 << self.Log2MinPUSize))
        self.PicHeightInMinPUs = -(-self.pic_height_in_luma_samples // (1 << self.Log2MinPUSize))
        self.PicWidthInTbsY = -(-self.pic_width_in_luma_samples // (1 << self.Log2MinTrafoSize))
        self.PicHeightInTbsY = -(-self.pic_height_in_luma_samples // (1 << self.Log2MinTrafoSize))
        self.MaxPicOrderCntLsb = 1 << self.log2_max_pic_order_cnt_lsb
        self.QpBdOffsetY = 6 * (self.bit_depth_luma - 8)
        self.QpBdOffsetC = 6 * (self.bit_depth_chroma - 8)


def read_sps(data: bytes) -> SPS:
    br = Bitreader(data[2:])
    s = SPS()
    s.video_parameter_set_id = br.get_bits(4)
    s.max_sub_layers = br.get_bits(3) + 1
    s.temporal_id_nesting_flag = br.get_bits(1)
    s.profile_tier_level = read_profile_tier_level(br, s.max_sub_layers)
    s.seq_parameter_set_id = br.get_uvlc()
    s.chroma_format_idc = br.get_uvlc()
    if s.chroma_format_idc == 3:
        s.separate_colour_plane_flag = br.get_bits(1)
    s.pic_width_in_luma_samples = br.get_uvlc()
    s.pic_height_in_luma_samples = br.get_uvlc()
    s.conformance_window_flag = br.get_bits(1)
    if s.conformance_window_flag:
        s.conf_win_left_offset = br.get_uvlc()
        s.conf_win_right_offset = br.get_uvlc()
        s.conf_win_top_offset = br.get_uvlc()
        s.conf_win_bottom_offset = br.get_uvlc()
    s.bit_depth_luma = br.get_uvlc() + 8
    s.bit_depth_chroma = br.get_uvlc() + 8
    s.log2_max_pic_order_cnt_lsb = br.get_uvlc() + 4
    s.sps_sub_layer_ordering_info_present_flag = br.get_bits(1)
    first = 0 if s.sps_sub_layer_ordering_info_present_flag else s.max_sub_layers - 1
    s.max_dec_pic_buffering = [0] * s.max_sub_layers
    s.max_num_reorder_pics = [0] * s.max_sub_layers
    s.max_latency_increase = [0] * s.max_sub_layers
    for i in range(first, s.max_sub_layers):
        s.max_dec_pic_buffering[i] = br.get_uvlc() + 1
        s.max_num_reorder_pics[i] = br.get_uvlc()
        s.max_latency_increase[i] = br.get_uvlc()
    if not s.sps_sub_layer_ordering_info_present_flag:
        for i in range(s.max_sub_layers - 1):
            s.max_dec_pic_buffering[i] = s.max_dec_pic_buffering[-1]
            s.max_num_reorder_pics[i] = s.max_num_reorder_pics[-1]
            s.max_latency_increase[i] = s.max_latency_increase[-1]
    s.log2_min_luma_coding_block_size = br.get_uvlc() + 3
    s.log2_diff_max_min_luma_coding_block_size = br.get_uvlc()
    s.log2_min_transform_block_size = br.get_uvlc() + 2
    s.log2_diff_max_min_transform_block_size = br.get_uvlc()
    s.max_transform_hierarchy_depth_inter = br.get_uvlc()
    s.max_transform_hierarchy_depth_intra = br.get_uvlc()
    s.scaling_list_enable_flag = br.get_bits(1)
    if s.scaling_list_enable_flag:
        if br.get_bits(1):  # sps_scaling_list_data_present_flag
            s.scaling_list = read_scaling_list_data(br)
        else:
            s.scaling_list = ScalingList.default()
    s.amp_enabled_flag = br.get_bits(1)
    s.sample_adaptive_offset_enabled_flag = br.get_bits(1)
    s.pcm_enabled_flag = br.get_bits(1)
    if s.pcm_enabled_flag:
        s.pcm_sample_bit_depth_luma = br.get_bits(4) + 1
        s.pcm_sample_bit_depth_chroma = br.get_bits(4) + 1
        s.log2_min_pcm_luma_coding_block_size = br.get_uvlc() + 3
        s.log2_diff_max_min_pcm_luma_coding_block_size = br.get_uvlc()
        s.pcm_loop_filter_disable_flag = br.get_bits(1)
    num_short_term = br.get_uvlc()
    for i in range(num_short_term):
        s.ref_pic_sets.append(
            read_short_term_rps(br, s.ref_pic_sets, i, num_short_term))
    s.long_term_ref_pics_present_flag = br.get_bits(1)
    if s.long_term_ref_pics_present_flag:
        s.num_long_term_ref_pics_sps = br.get_uvlc()
        for _ in range(s.num_long_term_ref_pics_sps):
            s.lt_ref_pic_poc_lsb_sps.append(br.get_bits(s.log2_max_pic_order_cnt_lsb))
            s.used_by_curr_pic_lt_sps_flag.append(br.get_bits(1))
    s.sps_temporal_mvp_enabled_flag = br.get_bits(1)
    s.strong_intra_smoothing_enable_flag = br.get_bits(1)
    s.vui_present = br.get_bits(1)
    if s.vui_present:
        read_vui(br, s)
    sps_extension_present = br.get_bits(1)
    if sps_extension_present:
        range_ext = br.get_bits(1)
        br.skip_bits(3)  # multilayer/3d/scc ... (we only honour range ext)
        br.skip_bits(4)
        if range_ext:
            s.range_extension = True
            s.transform_skip_rotation_enabled_flag = br.get_bits(1)
            s.transform_skip_context_enabled_flag = br.get_bits(1)
            s.implicit_rdpcm_enabled_flag = br.get_bits(1)
            s.explicit_rdpcm_enabled_flag = br.get_bits(1)
            s.extended_precision_processing_flag = br.get_bits(1)
            s.intra_smoothing_disabled_flag = br.get_bits(1)
            s.high_precision_offsets_enabled_flag = br.get_bits(1)
            s.persistent_rice_adaptation_enabled_flag = br.get_bits(1)
            s.cabac_bypass_alignment_enabled_flag = br.get_bits(1)
    s.derive()
    return s


class VUI:
    """Parsed VUI parameters (spec E.2.1); capability counterpart of
    reference vui.h/vui.cc (video_usability_information)."""
    def __init__(self):
        self.sar_width = 0
        self.sar_height = 0
        self.video_full_range_flag = 0
        self.colour_primaries = 2          # unspecified
        self.transfer_characteristics = 2
        self.matrix_coeffs = 2
        self.chroma_sample_loc_type_top_field = 0
        self.chroma_sample_loc_type_bottom_field = 0
        self.default_display_window = None   # (l, r, t, b) or None
        self.timing_info_present = 0
        self.num_units_in_tick = 0
        self.time_scale = 0
        self.min_spatial_segmentation_idc = 0
        self.max_bytes_per_pic_denom = 0
        self.max_bits_per_min_cu_denom = 0
        self.log2_max_mv_length_horizontal = 0
        self.log2_max_mv_length_vertical = 0

    @property
    def frame_rate(self):
        """Frames per second from timing info, or None."""
        if self.timing_info_present and self.num_units_in_tick:
            return self.time_scale / self.num_units_in_tick
        return None


# sample aspect ratios for aspect_ratio_idc 1..16 (spec table E.1)
SAR_TABLE = [(1, 1), (12, 11), (10, 11), (16, 11), (40, 33), (24, 11),
             (20, 11), (32, 11), (80, 33), (18, 11), (15, 11), (64, 33),
             (160, 99), (4, 3), (3, 2), (2, 1)]


def read_vui(br: Bitreader, sps: SPS):
    """spec E.2.1; full parse retained on sps.vui."""
    v = VUI()
    sps.vui = v
    if br.get_bits(1):  # aspect_ratio_info_present
        idc = br.get_bits(8)
        if idc == 255:  # EXTENDED_SAR
            v.sar_width = br.get_bits(16)
            v.sar_height = br.get_bits(16)
        elif 1 <= idc <= 16:
            v.sar_width, v.sar_height = SAR_TABLE[idc - 1]
    if br.get_bits(1):  # overscan_info_present
        br.skip_bits(1)
    if br.get_bits(1):  # video_signal_type_present
        br.skip_bits(3)  # video_format
        v.video_full_range_flag = br.get_bits(1)
        if br.get_bits(1):  # colour_description_present
            v.colour_primaries = br.get_bits(8)
            v.transfer_characteristics = br.get_bits(8)
            v.matrix_coeffs = br.get_bits(8)
    if br.get_bits(1):  # chroma_loc_info_present
        v.chroma_sample_loc_type_top_field = br.get_uvlc()
        v.chroma_sample_loc_type_bottom_field = br.get_uvlc()
    br.skip_bits(3)  # neutral_chroma, field_seq, frame_field_info
    if br.get_bits(1):  # default_display_window
        v.default_display_window = tuple(br.get_uvlc() for _ in range(4))
    v.timing_info_present = br.get_bits(1)
    if v.timing_info_present:
        v.num_units_in_tick = br.get_bits(32)
        v.time_scale = br.get_bits(32)
        if br.get_bits(1):  # poc_proportional_to_timing
            br.get_uvlc()
        if br.get_bits(1):  # hrd_parameters_present
            _skip_hrd(br, sps.max_sub_layers)
    if br.get_bits(1):  # bitstream_restriction
        br.skip_bits(3)
        v.min_spatial_segmentation_idc = br.get_uvlc()
        v.max_bytes_per_pic_denom = br.get_uvlc()
        v.max_bits_per_min_cu_denom = br.get_uvlc()
        v.log2_max_mv_length_horizontal = br.get_uvlc()
        v.log2_max_mv_length_vertical = br.get_uvlc()


def _skip_hrd(br: Bitreader, max_sub_layers: int):
    nal_hrd = br.get_bits(1)
    vcl_hrd = br.get_bits(1)
    sub_pic = 0
    if nal_hrd or vcl_hrd:
        sub_pic = br.get_bits(1)
        if sub_pic:
            br.skip_bits(8 + 5 + 31 + 8 + 8)
        br.skip_bits(4 + 4)
        if sub_pic:
            br.skip_bits(4)
        br.skip_bits(5 + 5 + 5)
    for _ in range(max_sub_layers):
        fixed_rate = br.get_bits(1)
        if not fixed_rate:
            fixed_rate = br.get_bits(1)
        low_delay = 0
        if fixed_rate:
            br.get_uvlc()
        else:
            low_delay = br.get_bits(1)
        cpb_cnt = 1
        if not low_delay:
            cpb_cnt = br.get_uvlc() + 1
        for hrd in (nal_hrd, vcl_hrd):
            if hrd:
                for _ in range(cpb_cnt):
                    br.get_uvlc()
                    br.get_uvlc()
                    if sub_pic:
                        br.get_uvlc()
                        br.get_uvlc()
                    br.skip_bits(1)


# --------------------------------------------------------------------------
@dataclass
class PPS:
    pic_parameter_set_id: int = 0
    seq_parameter_set_id: int = 0
    dependent_slice_segments_enabled_flag: int = 0
    output_flag_present_flag: int = 0
    num_extra_slice_header_bits: int = 0
    sign_data_hiding_flag: int = 0
    cabac_init_present_flag: int = 0
    num_ref_idx_l0_default_active: int = 1
    num_ref_idx_l1_default_active: int = 1
    pic_init_qp: int = 26
    constrained_intra_pred_flag: int = 0
    transform_skip_enabled_flag: int = 0
    cu_qp_delta_enabled_flag: int = 0
    diff_cu_qp_delta_depth: int = 0
    pic_cb_qp_offset: int = 0
    pic_cr_qp_offset: int = 0
    pps_slice_chroma_qp_offsets_present_flag: int = 0
    weighted_pred_flag: int = 0
    weighted_bipred_flag: int = 0
    transquant_bypass_enable_flag: int = 0
    tiles_enabled_flag: int = 0
    entropy_coding_sync_enabled_flag: int = 0
    num_tile_columns: int = 1
    num_tile_rows: int = 1
    uniform_spacing_flag: int = 1
    column_widths: List[int] = field(default_factory=list)
    row_heights: List[int] = field(default_factory=list)
    loop_filter_across_tiles_enabled_flag: int = 1
    pps_loop_filter_across_slices_enabled_flag: int = 0
    deblocking_filter_control_present_flag: int = 0
    deblocking_filter_override_enabled_flag: int = 0
    pic_disable_deblocking_filter_flag: int = 0
    beta_offset: int = 0
    tc_offset: int = 0
    pic_scaling_list_data_present_flag: int = 0
    scaling_list: Optional[ScalingList] = None
    lists_modification_present_flag: int = 0
    log2_parallel_merge_level: int = 2
    slice_segment_header_extension_present_flag: int = 0
    # range extension
    log2_max_transform_skip_block_size: int = 2
    cross_component_prediction_enabled_flag: int = 0
    chroma_qp_offset_list_enabled_flag: int = 0
    diff_cu_chroma_qp_offset_depth: int = 0
    cb_qp_offset_list: List[int] = field(default_factory=list)
    cr_qp_offset_list: List[int] = field(default_factory=list)
    log2_sao_offset_scale_luma: int = 0
    log2_sao_offset_scale_chroma: int = 0

    def derive(self, sps: SPS):
        """Tile geometry + CTB raster<->tile scan maps (spec 6.5.1/6.5.2);
        mirror of pps.h:159 set_derived_values."""
        self.sps = sps
        W, H = sps.PicWidthInCtbsY, sps.PicHeightInCtbsY
        nC, nR = self.num_tile_columns, self.num_tile_rows
        if not self.tiles_enabled_flag:
            nC = nR = 1
        if self.uniform_spacing_flag or not self.tiles_enabled_flag:
            self.colBd = [(i * W) // nC for i in range(nC + 1)]
            self.rowBd = [(i * H) // nR for i in range(nR + 1)]
        else:
            self.colBd = [0]
            for w in self.column_widths:
                self.colBd.append(self.colBd[-1] + w)
            self.colBd.append(W)  # last implicit
            self.rowBd = [0]
            for h in self.row_heights:
                self.rowBd.append(self.rowBd[-1] + h)
            self.rowBd.append(H)
        # CTB raster address -> tile id; raster<->tile-scan maps
        self.TileId = [0] * (W * H)
        self.CtbAddrRStoTS = [0] * (W * H)
        self.CtbAddrTStoRS = [0] * (W * H)
        ts = 0
        tile_idx = 0
        for tr in range(nR):
            for tc in range(nC):
                for y in range(self.rowBd[tr], self.rowBd[tr + 1]):
                    for x in range(self.colBd[tc], self.colBd[tc + 1]):
                        rs = y * W + x
                        self.TileId[rs] = tile_idx
                        self.CtbAddrRStoTS[rs] = ts
                        self.CtbAddrTStoRS[ts] = rs
                        ts += 1
                tile_idx += 1

    def tile_start_ctb(self, ctb_x, ctb_y):
        return ctb_x in self.colBd and ctb_y in self.rowBd

    def is_tile_start(self, ctb_rs):
        W = self.sps.PicWidthInCtbsY
        return self.tile_start_ctb(ctb_rs % W, ctb_rs // W) and \
            (ctb_rs % W) in self.colBd and (ctb_rs // W) in self.rowBd


def read_pps(data: bytes, sps_map) -> PPS:
    br = Bitreader(data[2:])
    p = PPS()
    p.pic_parameter_set_id = br.get_uvlc()
    p.seq_parameter_set_id = br.get_uvlc()
    p.dependent_slice_segments_enabled_flag = br.get_bits(1)
    p.output_flag_present_flag = br.get_bits(1)
    p.num_extra_slice_header_bits = br.get_bits(3)
    p.sign_data_hiding_flag = br.get_bits(1)
    p.cabac_init_present_flag = br.get_bits(1)
    p.num_ref_idx_l0_default_active = br.get_uvlc() + 1
    p.num_ref_idx_l1_default_active = br.get_uvlc() + 1
    p.pic_init_qp = br.get_svlc() + 26
    p.constrained_intra_pred_flag = br.get_bits(1)
    p.transform_skip_enabled_flag = br.get_bits(1)
    p.cu_qp_delta_enabled_flag = br.get_bits(1)
    if p.cu_qp_delta_enabled_flag:
        p.diff_cu_qp_delta_depth = br.get_uvlc()
    p.pic_cb_qp_offset = br.get_svlc()
    p.pic_cr_qp_offset = br.get_svlc()
    p.pps_slice_chroma_qp_offsets_present_flag = br.get_bits(1)
    p.weighted_pred_flag = br.get_bits(1)
    p.weighted_bipred_flag = br.get_bits(1)
    p.transquant_bypass_enable_flag = br.get_bits(1)
    p.tiles_enabled_flag = br.get_bits(1)
    p.entropy_coding_sync_enabled_flag = br.get_bits(1)
    if p.tiles_enabled_flag:
        p.num_tile_columns = br.get_uvlc() + 1
        p.num_tile_rows = br.get_uvlc() + 1
        p.uniform_spacing_flag = br.get_bits(1)
        if not p.uniform_spacing_flag:
            for _ in range(p.num_tile_columns - 1):
                p.column_widths.append(br.get_uvlc() + 1)
            for _ in range(p.num_tile_rows - 1):
                p.row_heights.append(br.get_uvlc() + 1)
        p.loop_filter_across_tiles_enabled_flag = br.get_bits(1)
    p.pps_loop_filter_across_slices_enabled_flag = br.get_bits(1)
    p.deblocking_filter_control_present_flag = br.get_bits(1)
    if p.deblocking_filter_control_present_flag:
        p.deblocking_filter_override_enabled_flag = br.get_bits(1)
        p.pic_disable_deblocking_filter_flag = br.get_bits(1)
        if not p.pic_disable_deblocking_filter_flag:
            p.beta_offset = br.get_svlc() * 2
            p.tc_offset = br.get_svlc() * 2
    p.pic_scaling_list_data_present_flag = br.get_bits(1)
    if p.pic_scaling_list_data_present_flag:
        p.scaling_list = read_scaling_list_data(br)
    p.lists_modification_present_flag = br.get_bits(1)
    p.log2_parallel_merge_level = br.get_uvlc() + 2
    p.slice_segment_header_extension_present_flag = br.get_bits(1)
    pps_extension_present = br.get_bits(1)
    if pps_extension_present:
        range_ext = br.get_bits(1)
        br.skip_bits(7)
        if range_ext:
            if p.transform_skip_enabled_flag:
                p.log2_max_transform_skip_block_size = br.get_uvlc() + 2
            p.cross_component_prediction_enabled_flag = br.get_bits(1)
            p.chroma_qp_offset_list_enabled_flag = br.get_bits(1)
            if p.chroma_qp_offset_list_enabled_flag:
                p.diff_cu_chroma_qp_offset_depth = br.get_uvlc()
                n = br.get_uvlc() + 1
                for _ in range(n):
                    p.cb_qp_offset_list.append(br.get_svlc())
                    p.cr_qp_offset_list.append(br.get_svlc())
            p.log2_sao_offset_scale_luma = br.get_uvlc()
            p.log2_sao_offset_scale_chroma = br.get_uvlc()
    sps = sps_map[p.seq_parameter_set_id]
    p.derive(sps)
    return p
