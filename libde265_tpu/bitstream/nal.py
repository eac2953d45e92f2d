"""NAL unit handling: Annex-B start-code splitting, emulation-prevention
removal, NAL header parse, and unit-type classification.

Capability counterpart of /root/reference/libde265/nal.{h,cc} and
nal-parser.{h,cc}; written fresh from H.265 Annex B + clause 7.4.2.
"""
from dataclasses import dataclass, field
from typing import List, Optional

# NAL unit types (spec Table 7-1)
NAL_TRAIL_N = 0
NAL_TRAIL_R = 1
NAL_TSA_N = 2
NAL_TSA_R = 3
NAL_STSA_N = 4
NAL_STSA_R = 5
NAL_RADL_N = 6
NAL_RADL_R = 7
NAL_RASL_N = 8
NAL_RASL_R = 9
NAL_BLA_W_LP = 16
NAL_BLA_W_RADL = 17
NAL_BLA_N_LP = 18
NAL_IDR_W_RADL = 19
NAL_IDR_N_LP = 20
NAL_CRA_NUT = 21
NAL_RSV_IRAP_VCL22 = 22
NAL_RSV_IRAP_VCL23 = 23
NAL_VPS_NUT = 32
NAL_SPS_NUT = 33
NAL_PPS_NUT = 34
NAL_AUD_NUT = 35
NAL_EOS_NUT = 36
NAL_EOB_NUT = 37
NAL_FD_NUT = 38
NAL_PREFIX_SEI = 39
NAL_SUFFIX_SEI = 40


def is_idr(t):
    return t in (NAL_IDR_W_RADL, NAL_IDR_N_LP)


def is_bla(t):
    return t in (NAL_BLA_W_LP, NAL_BLA_W_RADL, NAL_BLA_N_LP)


def is_cra(t):
    return t == NAL_CRA_NUT


def is_rap(t):
    return NAL_BLA_W_LP <= t <= NAL_RSV_IRAP_VCL23


def is_rasl(t):
    return t in (NAL_RASL_N, NAL_RASL_R)


def is_radl(t):
    return t in (NAL_RADL_N, NAL_RADL_R)


def is_vcl(t):
    return t < 32


def is_sublayer_non_reference(t):
    return t in (NAL_TRAIL_N, NAL_TSA_N, NAL_STSA_N, NAL_RADL_N, NAL_RASL_N, 10, 12, 14)


@dataclass
class NALHeader:
    nal_unit_type: int = 0
    nuh_layer_id: int = 0
    nuh_temporal_id: int = 0  # = temporal_id_plus1 - 1


@dataclass
class NALUnit:
    """One NAL with emulation-prevention bytes removed.

    skipped positions (indices into the *stripped* payload where a 0x03 byte
    was removed) are kept so entry_point_offsets — which are expressed in
    pre-stripping bytes — can be fixed up, mirroring the behavior of
    /root/reference/libde265/nal-parser.cc (remove_stuffing_bytes) and
    decctx.cc:652-656.
    """
    data: bytes
    header: NALHeader
    pts: Optional[int] = None
    skipped: List[int] = field(default_factory=list)


def unescape_rbsp(raw: bytes):
    """Remove emulation_prevention_three_bytes (00 00 03 -> 00 00).

    Returns (stripped_bytes, skipped_positions) where positions index into the
    stripped stream at the point each 0x03 was dropped.
    """
    out = bytearray()
    skipped = []
    i, n = 0, len(raw)
    zeros = 0
    while i < n:
        b = raw[i]
        if zeros >= 2 and b == 3 and i + 1 <= n:
            # emulation prevention byte: drop it
            skipped.append(len(out))
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out), skipped


def parse_nal_header(data: bytes) -> NALHeader:
    """Spec 7.3.1.2: forbidden_zero_bit, 6b type, 6b layer id, 3b tid+1."""
    if len(data) < 2:
        raise ValueError("NAL too short")
    b0, b1 = data[0], data[1]
    return NALHeader(
        nal_unit_type=(b0 >> 1) & 0x3F,
        nuh_layer_id=((b0 & 1) << 5) | (b1 >> 3),
        nuh_temporal_id=(b1 & 7) - 1,
    )


def split_annexb(stream: bytes) -> List[NALUnit]:
    """Split an Annex-B bytestream at 00 00 01 start codes into NAL units."""
    units = []
    n = len(stream)
    # find all start codes
    starts = []
    i = 0
    while True:
        j = stream.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        starts.append(j + 3)
        i = j + 3
    for k, s in enumerate(starts):
        e = (starts[k + 1] - 3) if k + 1 < len(starts) else n
        # trim the extra leading zero of a 4-byte start code of the NEXT nal
        while e > s and stream[e - 1] == 0 and k + 1 < len(starts):
            e -= 1
        raw = stream[s:e]
        if len(raw) < 2:
            continue
        stripped, skipped = unescape_rbsp(raw)
        units.append(NALUnit(data=stripped, header=parse_nal_header(stripped), skipped=skipped))
    return units


class NALParser:
    """Incremental Annex-B push parser (capability mirror of
    /root/reference/libde265/nal-parser.h:87-151)."""

    def __init__(self):
        self._buf = bytearray()
        self.queue: List[NALUnit] = []
        self.end_of_stream = False
        self.end_of_frame = False
        self._pts = None

    def push_data(self, data: bytes, pts=None):
        self._pts = pts
        self._buf.extend(data)
        self._extract(final=False)

    def push_nal(self, nal_data: bytes, pts=None):
        stripped, skipped = unescape_rbsp(nal_data)
        self.queue.append(
            NALUnit(data=stripped, header=parse_nal_header(stripped), pts=pts, skipped=skipped)
        )

    def flush(self):
        self._extract(final=True)
        self.end_of_stream = True

    def mark_end_of_frame(self):
        self.end_of_frame = True

    def _extract(self, final: bool):
        buf = bytes(self._buf)
        starts = []
        i = 0
        while True:
            j = buf.find(b"\x00\x00\x01", i)
            if j < 0:
                break
            starts.append(j)
            i = j + 3
        if not starts:
            return
        # everything between consecutive start codes is a complete NAL;
        # the tail after the last start code is complete only on flush
        for k in range(len(starts) - (0 if final else 1)):
            s = starts[k] + 3
            e = starts[k + 1] if k + 1 < len(starts) else len(buf)
            while e > s and buf[e - 1] == 0 and k + 1 < len(starts):
                e -= 1
            raw = buf[s:e]
            if len(raw) >= 2:
                stripped, skipped = unescape_rbsp(raw)
                self.queue.append(
                    NALUnit(
                        data=stripped,
                        header=parse_nal_header(stripped),
                        pts=self._pts,
                        skipped=skipped,
                    )
                )
        keep_from = starts[-1] if not final else len(buf)
        del self._buf[:keep_from]

    def pop(self) -> Optional[NALUnit]:
        if self.queue:
            return self.queue.pop(0)
        return None

    def number_pending(self) -> int:
        return len(self.queue)
