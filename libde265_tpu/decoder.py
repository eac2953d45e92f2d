"""Top-level decoder orchestration: NAL routing, header storage, POC/RPS/ref
lists, picture assembly and output queue.

Capability counterpart of /root/reference/libde265/decctx.{h,cc}
(decoder_context::decode / decode_NAL / process_slice_segment_header /
process_picture_order_count / process_reference_picture_set /
construct_reference_picture_lists).
"""
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from .bitstream import nal as nal_mod
from .bitstream.nal import NALParser
from .bitstream.paramsets import read_vps, read_sps, read_pps, VPS, SPS, PPS
from .bitstream.sliceheader import read_slice_header, SLICE_TYPE_I
from .bitstream.ctu import SliceReader
from .plan import FramePlan
from .dpb import DPB, SHORT_TERM, LONG_TERM, UNUSED
from .errors import Warning as W, WarningQueue
from .reconstruct import reconstruct_frame


class Decoder:
    """Stream decoder with the same lifecycle as the reference C API:
    push_data() / flush() / decode() / get_next_picture()."""

    def __init__(self, backend="numpy"):
        self.nal_parser = NALParser()
        self.vps: Dict[int, VPS] = {}
        self.sps: Dict[int, SPS] = {}
        self.pps: Dict[int, PPS] = {}
        self.dpb = DPB()
        self.backend = backend

        self.img: Optional[FramePlan] = None   # current picture under decode
        self.img_dpb_idx = -1
        self.prev_tid0_poc = 0
        self.poc = 0
        self.first_decoded_picture = True
        self.no_rasl_output_flag = False
        self.handle_cra_as_bla = False
        self.last_rap_poc = 0
        self.curr_rps = None          # marked reference sets for current pic
        self.ref_pic_lists = None     # per-slice [l][i] -> dpb idx
        self.warning_queue = WarningQueue()
        self.limit_tid = 100
        self.framerate_ratio = 100    # de265_set_framerate_ratio percent
        self._framedrop_tab = None    # percent -> (tid, in-layer ratio)
        self.wpp_contexts = {}
        self.dep_slice_ctx = None
        self.width = 0
        self.height = 0
        self._cur_independent_sh = None
        self._pending_hash = None
        from .errors import DecodeError
        self.status = DecodeError.OK

    # ----------------------------------------------------------- warnings
    @property
    def warnings(self) -> List[str]:
        """Readable warning log (strings); typed codes via get_warning()."""
        return self.warning_queue.messages

    def _warn(self, code, detail=""):
        self.warning_queue.add(code, detail)

    def get_warning(self):
        """Pop the oldest typed warning code (de265_get_warning)."""
        return self.warning_queue.get()

    # ------------------------------------------------------------------ API
    def push_data(self, data: bytes, pts=None):
        self.nal_parser.push_data(data, pts)

    def push_nal(self, data: bytes, pts=None):
        self.nal_parser.push_nal(data, pts)

    def flush(self):
        self.nal_parser.flush()

    def decode(self) -> bool:
        """Decode one NAL; returns True if more work may remain.
        Sets self.status (DecodeError.OK / WAITING_FOR_INPUT /
        IMAGE_BUFFER_FULL) mirroring the reference stall states
        (decctx.cc:1271-1304)."""
        from .errors import DecodeError
        self.status = DecodeError.OK
        nal = self.nal_parser.pop()
        if nal is None:
            if self.nal_parser.end_of_stream:
                self._finish_picture()
                self.dpb.flush_reorder()
                return False
            self.status = DecodeError.WAITING_FOR_INPUT
            return False
        self._decode_nal(nal)
        return True

    def reset(self):
        """Reset for seeking: drop queued NALs, the picture under decode and
        all DPB state; keep parameter sets (de265_reset, decctx.cc:360-428).
        The next pushed data should start at a RAP."""
        self.nal_parser = NALParser()
        self.dpb.reset()
        self.img = None
        self.img_dpb_idx = -1
        self.prev_tid0_poc = 0
        self.poc = 0
        self.first_decoded_picture = True
        self.no_rasl_output_flag = False
        self.last_rap_poc = 0
        self.curr_rps = None
        self.ref_pic_lists = None
        self.wpp_contexts = {}
        self.dep_slice_ctx = None
        self._cur_independent_sh = None
        self._pending_hash = None

    def decode_all(self):
        while self.decode():
            pass

    def get_next_picture(self):
        p = self.dpb.pop_output()
        return p

    # -------------------------------------------- temporal scalability
    # mirrors reference decctx.cc:2132-2223 (get_highest_TID /
    # set_framerate_ratio / compute_framedrop_table / change_framerate):
    # a percent in [0,100] maps onto the temporal layers, dropping the
    # highest layers first.
    def get_highest_tid(self) -> int:
        for s in self.sps.values():
            return s.max_sub_layers - 1
        for v in self.vps.values():
            return getattr(v, "max_sub_layers", 7) - 1
        return 6

    def _compute_framedrop_table(self):
        highest = self.get_highest_tid()
        tab = [(0, 100)] * 101
        tid_index = {}
        for tid in range(highest, -1, -1):
            lower = 100 * tid // (highest + 1)
            higher = 100 * (tid + 1) // (highest + 1)
            for l in range(lower, higher + 1):
                ratio = 100 * (l - lower) // max(1, higher - lower)
                t = tid
                if t > self.limit_tid:
                    t, ratio = self.limit_tid, 100
                tab[l] = (t, ratio)
            tid_index[tid] = higher
        self._framedrop_tab = tab
        self._framedrop_tid_index = tid_index

    def _calc_tid(self):
        highest = self.get_highest_tid()
        if self._framedrop_tab is None or self._framedrop_tab[100][0] != highest:
            self._compute_framedrop_table()
        tid, _layer_ratio = self._framedrop_tab[self.framerate_ratio]
        self._current_highest_tid = tid

    def set_framerate_ratio(self, percent: int):
        """Decode only `percent` of the frame rate by dropping the
        highest temporal sub-layers (de265_set_framerate_ratio)."""
        self.framerate_ratio = max(0, min(100, percent))
        self._calc_tid()

    def set_limit_tid(self, max_tid: int):
        self.limit_tid = max_tid
        self._framedrop_tab = None
        self._calc_tid()

    def change_framerate(self, more: int) -> int:
        """Step one temporal layer up (+1) or down (-1); returns the new
        framerate ratio percent (de265_change_framerate)."""
        if not self.sps:
            return self.framerate_ratio
        highest = self.get_highest_tid()
        self._calc_tid()
        goal = max(0, min(self._current_highest_tid + more, highest))
        self.framerate_ratio = self._framedrop_tid_index.get(goal, 100)
        self._calc_tid()
        return self.framerate_ratio

    # ------------------------------------------------------------------ NAL
    def _decode_nal(self, nal):
        t = nal.header.nal_unit_type
        if nal.header.nuh_layer_id != 0:
            return
        gate_tid = getattr(self, "_current_highest_tid", None)
        if gate_tid is None:
            gate_tid = self.limit_tid
        if t <= 31 and nal.header.nuh_temporal_id > gate_tid:
            return
        if t == nal_mod.NAL_VPS_NUT:
            try:
                v = read_vps(nal.data)
            except Exception as e:
                self._warn(W.VPS_HEADER_INVALID, str(e))
                return
            self.vps[v.video_parameter_set_id] = v
        elif t == nal_mod.NAL_SPS_NUT:
            try:
                s = read_sps(nal.data)
            except Exception as e:
                self._warn(W.SPS_HEADER_INVALID, str(e))
                return
            self.sps[s.seq_parameter_set_id] = s
            # number of temporal layers is now known: recompute the
            # framedrop table (reference decctx.cc:1979)
            self._calc_tid()
        elif t == nal_mod.NAL_PPS_NUT:
            try:
                p = read_pps(nal.data, self.sps)
            except Exception as e:
                self._warn(W.PPS_HEADER_INVALID, str(e))
                return
            self.pps[p.pic_parameter_set_id] = p
        elif t in (nal_mod.NAL_PREFIX_SEI, nal_mod.NAL_SUFFIX_SEI):
            from .bitstream.sei import parse_sei
            try:
                for msg in parse_sei(nal.data):
                    if msg.picture_hash is not None:
                        self._pending_hash = msg.picture_hash
            except Exception as e:
                self._warn(W.SPS_MISSING_CANNOT_DECODE_SEI, str(e))
        elif t in (nal_mod.NAL_EOS_NUT, nal_mod.NAL_EOB_NUT, nal_mod.NAL_AUD_NUT,
                   nal_mod.NAL_FD_NUT):
            pass
        elif t < 32:
            self._decode_slice_nal(nal)

    # ---------------------------------------------------------------- slice
    def _decode_slice_nal(self, nal):
        t = nal.header.nal_unit_type
        # RASL pictures after a BLA / stream-initial CRA reference pictures
        # from before the random-access point: skip them
        # (reference: NoRaslOutputFlag handling, decctx.cc:2038-2048)
        if nal_mod.is_rasl(t) and self.no_rasl_output_flag:
            self._warn(W.RASL_PICTURE_SKIPPED,
                       "RASL picture after random access skipped")
            return
        try:
            sh = read_slice_header(nal.data, nal.header, self.pps, self.sps)
        except KeyError:
            self._warn(W.NONEXISTING_PPS_REFERENCED)
            return
        except Exception as e:
            self._warn(W.SLICEHEADER_INVALID, str(e))
            return
        if sh.pic_parameter_set_id not in self.pps:
            self._warn(W.NONEXISTING_PPS_REFERENCED)
            return
        pps = self.pps[sh.pic_parameter_set_id]
        sps = pps.sps
        if sh.slice_segment_address >= sps.PicSizeInCtbsY or \
                sh.slice_segment_address < 0:
            self._warn(W.SLICE_SEGMENT_ADDRESS_INVALID,
                       str(sh.slice_segment_address))
            return

        if sh.first_slice_segment_in_pic_flag:
            self._finish_picture()
            self._start_picture(sh, sps, pps, nal)
        if self.img is None:
            # non-first slice segment without a started picture
            self._warn(W.SLICEHEADER_INVALID,
                       "slice segment before first slice of picture")
            return

        if not sh.dependent_slice_segment_flag:
            sh.SliceAddrRS = sh.slice_segment_address
            self._cur_independent_sh = sh
        else:
            parent = getattr(self, "_cur_independent_sh", None)
            if parent is None:
                # dependent segment with no preceding independent slice
                # (reference guard: slice.cc first-slice checks)
                self._warn(W.DEPENDENT_SLICE_WITH_ADDRESS_ZERO,
                           "dependent slice without independent predecessor")
                return
            sh.SliceAddrRS = parent.SliceAddrRS
            # dependent segments inherit everything not re-sent
            for attr in ("slice_type", "slice_qp_delta", "SliceQPY", "initType",
                         "slice_sao_luma_flag", "slice_sao_chroma_flag",
                         "num_ref_idx_l0_active", "num_ref_idx_l1_active",
                         "slice_deblocking_filter_disabled_flag",
                         "slice_beta_offset", "slice_tc_offset",
                         "slice_cb_qp_offset", "slice_cr_qp_offset",
                         "slice_loop_filter_across_slices_enabled_flag",
                         "cabac_init_flag", "collocated_from_l0_flag",
                         "collocated_ref_idx", "MaxNumMergeCand", "pred_weight",
                         "mvd_l1_zero_flag", "slice_temporal_mvp_enabled_flag"):
                setattr(sh, attr, getattr(parent, attr))
        self.img.slice_headers.append(sh)

        # reference lists for this slice
        ref_lists = None
        if sh.slice_type != SLICE_TYPE_I:
            ref_lists = self._construct_ref_lists(sh, sps, pps)
        sh.RefPicList = ref_lists

        # entry point offset fixup for stripped emulation-prevention bytes
        # (mirror of decctx.cc:652-656)
        data_start = sh.header_size_bytes
        slice_data = nal.data[data_start:]
        if sh.entry_point_offsets and nal.skipped:
            # entry offsets count pre-stripping bytes; our NAL payload already
            # has emulation-prevention bytes removed, so convert
            sh.entry_point_offsets = _fixup_entry_points(
                sh.entry_point_offsets, nal.skipped, data_start)

        motion = None
        if sh.slice_type != SLICE_TYPE_I:
            from .motion import MotionDeriver
            motion = MotionDeriver(self, self.img, sh)
        reader = SliceReader(self.img, sh, slice_data, motion=motion,
                             wpp_contexts=self.wpp_contexts,
                             dep_slice_ctx=self.dep_slice_ctx)
        try:
            reader.decode()
        except Exception as e:
            # corrupted slice data: keep whatever was decoded, mark the
            # picture, continue with the next NAL (reference: mark rows
            # complete + integrity DECODING_ERRORS, slice.cc:4988-5001)
            self._warn(W.SLICE_DATA_CORRUPTED,
                       f"POC {self.img.poc}: {type(e).__name__}: {e}")
            if 0 <= self.img_dpb_idx < len(self.dpb.pics):
                self.dpb.pics[self.img_dpb_idx].integrity = 1
            return
        self.dep_slice_ctx = reader.saved_ctx_for_dep

    # ------------------------------------------------------------- pictures
    def _start_picture(self, sh, sps, pps, nal):
        t = sh.nal_unit_type
        if nal_mod.is_rap(t):
            # NoRaslOutputFlag (spec 8.1): RASL pics after this IRAP must be
            # dropped when decoding (re)starts here
            self.no_rasl_output_flag = bool(
                nal_mod.is_idr(t) or nal_mod.is_bla(t) or
                self.first_decoded_picture or
                (nal_mod.is_cra(t) and self.handle_cra_as_bla))
        self._compute_poc(sh, sps)
        if not nal_mod.is_idr(t):
            if nal_mod.is_rap(t) and self.no_rasl_output_flag:
                # IRAP with NoRaslOutputFlag: all refs become unused before
                # RPS derivation (spec 8.3.2; reference decctx.cc:1441)
                self.dpb.clear_references()
            self._process_rps(sh, sps)
        else:
            self.dpb.clear_references()
            self.curr_rps = {"st_curr_before": [], "st_curr_after": [],
                             "lt_curr": [], "st_follow": []}
        if not self.dpb.has_free():
            # DPB full (reference stall state IMAGE_BUFFER_FULL,
            # decctx.cc:1271-1304). Our output queue is pull-based and
            # unbounded, so flush the reorder buffer to free slots instead of
            # stalling; if the stream itself over-references, drop the oldest
            # reference with a warning rather than deadlock.
            from .errors import DecodeError
            self.status = DecodeError.IMAGE_BUFFER_FULL
            while self.dpb.reorder and not self.dpb.has_free():
                self.dpb.output_next()
            if not self.dpb.has_free():
                self._warn(W.DPB_FULL_PICTURE_DROPPED)
                self.dpb.drop_oldest_reference()
        idx = self.dpb.new_picture(self.poc)
        self.img_dpb_idx = idx
        self.img = FramePlan(sps, pps, poc=self.poc)
        self.width = sps.pic_width_in_luma_samples
        self.height = sps.pic_height_in_luma_samples
        pic = self.dpb.pics[idx]
        pic.plan = self.img
        pic.pic_output_flag = bool(sh.pic_output_flag)
        pic.pts = nal.pts       # de265_push_data PTS -> output picture
        self.wpp_contexts = {}
        self.dep_slice_ctx = None

    def _finish_picture(self):
        if self.img is None:
            return
        img = self.img
        try:
            planes = reconstruct_frame(img, dpb_images=self.dpb)
        except Exception as e:
            # reconstruction of a corrupted plan failed: conceal with grey
            self._warn(W.SLICE_DATA_CORRUPTED,
                       f"POC {img.poc} reconstruction failed: {e}")
            from .plan import grey_planes
            planes = grey_planes(img.sps, img.W, img.H)
            if 0 <= self.img_dpb_idx < len(self.dpb.pics):
                self.dpb.pics[self.img_dpb_idx].integrity = 1
        ph = getattr(self, "_pending_hash", None)
        if ph is not None:
            from .bitstream.sei import verify_picture_hash
            if not verify_picture_hash(planes, ph, img.sps.BitDepthY):
                self._warn(W.CHECKSUM_MISMATCH,
                           f"decoded-picture-hash MISMATCH for POC {img.poc}")
            else:
                self.hash_checks_passed = getattr(self, "hash_checks_passed", 0) + 1
            self._pending_hash = None
        img.compress_motion()
        pic = self.dpb.pics[self.img_dpb_idx]
        pic.planes = planes
        pic.output_planes = self._crop(img, planes)
        # output process (decctx.cc:1914-1953)
        sps = img.sps
        self.dpb.insert_reorder(self.img_dpb_idx)
        if not pic.pic_output_flag:
            # remove from reorder, never output
            self.dpb.reorder.remove(self.img_dpb_idx)
            pic.needed_for_output = False
        # index by the operating temporal layer, not the highest coded one
        # (reference: layer-indexed sps_max_num_reorder_pics, decctx.cc:1914)
        tid = getattr(self, "_current_highest_tid", self.limit_tid)
        max_reorder = sps.max_num_reorder_pics[
            min(tid, len(sps.max_num_reorder_pics) - 1)]
        while self.dpb.num_pictures_in_reorder() > max_reorder:
            self.dpb.output_next()
        self.img = None
        self.img_dpb_idx = -1

    def _crop(self, img, planes):
        sps = img.sps
        if not sps.conformance_window_flag:
            return planes
        sw, shh = sps.SubWidthC, sps.SubHeightC
        l = sps.conf_win_left_offset * sw
        r = sps.conf_win_right_offset * sw
        t = sps.conf_win_top_offset * shh
        b = sps.conf_win_bottom_offset * shh
        out = [planes[0][t:img.H - b, l:img.W - r]]
        cl, cr_, ct, cb = l // sw, r // sw, t // shh, b // shh
        for c in (1, 2):
            h, w = planes[c].shape
            out.append(planes[c][ct:h - cb, cl:w - cr_])
        return out

    # ------------------------------------------------------------ POC (8.3.1)
    def _compute_poc(self, sh, sps):
        t = sh.nal_unit_type
        max_lsb = sps.MaxPicOrderCntLsb
        lsb = sh.slice_pic_order_cnt_lsb
        if nal_mod.is_idr(t):
            self.poc = 0
            self.prev_tid0_poc = 0
            self.first_decoded_picture = False
            self.last_rap_poc = 0
            return
        prev = self.prev_tid0_poc
        prev_lsb = (prev % max_lsb + max_lsb) % max_lsb
        prev_msb = prev - prev_lsb
        if nal_mod.is_rap(t) and (self.first_decoded_picture or
                                  (nal_mod.is_bla(t) or
                                   (nal_mod.is_cra(t) and self.handle_cra_as_bla))):
            msb = 0
            self.poc = lsb
        else:
            if lsb < prev_lsb and prev_lsb - lsb >= max_lsb // 2:
                msb = prev_msb + max_lsb
            elif lsb > prev_lsb and lsb - prev_lsb > max_lsb // 2:
                msb = prev_msb - max_lsb
            else:
                msb = prev_msb
            self.poc = msb + lsb
        if sh.nuh_temporal_id == 0 and not nal_mod.is_rasl(t) and \
                not nal_mod.is_radl(t) and not nal_mod.is_sublayer_non_reference(t):
            self.prev_tid0_poc = self.poc
        if nal_mod.is_rap(t):
            self.last_rap_poc = self.poc
        self.first_decoded_picture = False

    # ------------------------------------------------------------ RPS (8.3.2)
    def _process_rps(self, sh, sps):
        rps = sh.slice_rps if sh.slice_rps is not None else \
            (sps.ref_pic_sets[sh.CurrRpsIdx] if sps.ref_pic_sets else None)
        st_before, st_after, st_follow = [], [], []
        lt_curr, lt_follow = [], []
        if rps is not None:
            for d, used in zip(rps.delta_poc_s0, rps.used_s0):
                (st_before if used else st_follow).append(self.poc + d)
            for d, used in zip(rps.delta_poc_s1, rps.used_s1):
                (st_after if used else st_follow).append(self.poc + d)
        lt_pocs = []
        max_lsb = sps.MaxPicOrderCntLsb
        for i in range(sh.num_long_term_sps + sh.num_long_term_pics):
            poc_lt = sh.poc_lsb_lt[i]
            has_msb = bool(sh.delta_poc_msb_present_flag[i])
            if has_msb:
                lsb = sh.slice_pic_order_cnt_lsb
                poc_lt = self.poc - sh.delta_poc_msb_cycle_lt[i] * max_lsb - \
                    (lsb - sh.poc_lsb_lt[i])
            used = bool(sh.used_by_curr_pic_lt_flag[i])
            (lt_curr if used else lt_follow).append((poc_lt, has_msb))

        # mark pictures
        dpb = self.dpb
        curr = {"st_curr_before": [], "st_curr_after": [], "lt_curr": [],
                "st_follow": []}
        marked = set()
        for name, pocs in (("st_curr_before", st_before), ("st_curr_after", st_after)):
            for poc in pocs:
                i = dpb.index_with_poc(poc)
                if i < 0:
                    self._warn(W.NONEXISTING_REFERENCE_PICTURE_ACCESSED,
                               f"missing short-term reference POC {poc}")
                    i = self._generate_missing_reference(poc, sps)
                dpb.pics[i].state = SHORT_TERM
                curr[name].append(i)
                marked.add(i)
        follow_idx = set()
        for poc in st_follow:
            i = dpb.index_with_poc(poc)
            if i >= 0:
                dpb.pics[i].state = SHORT_TERM
                follow_idx.add(i)
                marked.add(i)
        for poc_lt, has_msb in lt_curr:
            if has_msb:
                i = dpb.index_with_poc(poc_lt)
            else:
                i = dpb.index_with_poc_lsb(poc_lt, max_lsb)
            if i < 0:
                self._warn(W.NONEXISTING_REFERENCE_PICTURE_ACCESSED,
                           f"missing long-term reference POC {poc_lt}")
                i = self._generate_missing_reference(poc_lt, sps)
            dpb.pics[i].state = LONG_TERM
            curr["lt_curr"].append(i)
            marked.add(i)
        for poc_lt, has_msb in lt_follow:
            i = dpb.index_with_poc(poc_lt) if has_msb else \
                dpb.index_with_poc_lsb(poc_lt, max_lsb)
            if i >= 0:
                dpb.pics[i].state = LONG_TERM
                marked.add(i)
        # unmark everything else
        for i, p in enumerate(dpb.pics):
            if p.state != UNUSED and i not in marked and i != self.img_dpb_idx:
                p.state = UNUSED
        self.curr_rps = curr

    def _generate_missing_reference(self, poc, sps):
        """Grey concealment frame (decctx.cc:1408-1434)."""
        idx = self.dpb.new_picture(poc)
        pic = self.dpb.pics[idx]
        pic.needed_for_output = False
        W, H = sps.pic_width_in_luma_samples, sps.pic_height_in_luma_samples
        from .plan import grey_planes
        pic.planes = grey_planes(sps, W, H)
        pic.plan = FramePlan(sps, list(self.pps.values())[0], poc=poc)
        pic.integrity = 1
        return idx

    # ------------------------------------------------------ ref lists (8.3.4)
    def _construct_ref_lists(self, sh, sps, pps):
        curr = self.curr_rps or {"st_curr_before": [], "st_curr_after": [],
                                 "lt_curr": []}
        before = curr["st_curr_before"]
        after = curr["st_curr_after"]
        lt = curr["lt_curr"]
        n_total = len(before) + len(after) + len(lt)
        lists = []
        for l in range(2):
            n_active = sh.num_ref_idx_l0_active if l == 0 else sh.num_ref_idx_l1_active
            if l == 0:
                tmp = before + after + lt
            else:
                tmp = after + before + lt
            if not tmp:
                lists.append([])
                continue
            while len(tmp) < n_active:
                tmp = tmp + tmp  # wrap-around fill
            tmp = tmp[:max(n_active, n_total)]
            mod_flag = sh.ref_pic_list_modification_flag_l0 if l == 0 else \
                sh.ref_pic_list_modification_flag_l1
            entries = sh.list_entry_l0 if l == 0 else sh.list_entry_l1
            base = (before + after + lt) if l == 0 else (after + before + lt)
            if mod_flag:
                full = base
                while len(full) < n_active:
                    full = full + full
                out = [full[e] for e in entries[:n_active]]
            else:
                out = tmp[:n_active]
            lists.append(out)
        # remember long-term-ness for TMVP
        sh.RefIsLongTerm = [[self.dpb.pics[i].state == LONG_TERM for i in ll]
                            for ll in lists]
        sh.RefPOC = [[self.dpb.pics[i].poc for i in ll] for ll in lists]
        return lists


def _skipped_before(skipped, pos):
    return sum(1 for s in skipped if s < pos)


def _fixup_entry_points(offsets, skipped, data_start):
    """Entry-point offsets count unstripped bytes; convert to offsets within
    the stripped slice-data buffer (decctx.cc:652-656 equivalent)."""
    rel_skips = sorted(s - data_start for s in skipped if s >= data_start)
    fixed = []
    prev_stripped = 0
    acc_unstripped = 0
    for off in offsets:
        acc_unstripped += off
        # stripped position = unstripped - (#skips with unstripped pos < acc)
        # skip k (stripped pos p = rel_skips[k]) has unstripped pos p + k + 1
        n = 0
        for k, p in enumerate(rel_skips):
            if p + k < acc_unstripped:
                n = k + 1
            else:
                break
        stripped_pos = acc_unstripped - n
        fixed.append(stripped_pos - prev_stripped)
        prev_stripped = stripped_pos
    return fixed
