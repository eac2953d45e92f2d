"""Public decoding API, mirroring the de265_* C surface
(/root/reference/libde265/de265.h:190-430) in pythonic form:

    dec = new_decoder()
    push_data(dec, chunk)
    flush_data(dec)
    while decode(dec): ...
    pic = get_next_picture(dec)   # -> DecodedPicture or None
"""
import hashlib
from dataclasses import dataclass

import numpy as np

from .decoder import Decoder


@dataclass
class DecodedPicture:
    poc: int
    planes: list          # [Y, Cb, Cr] numpy arrays (conformance-cropped)

    @property
    def width(self):
        return self.planes[0].shape[1]

    @property
    def height(self):
        return self.planes[0].shape[0]

    def plane_md5(self, idx):
        """Per-plane MD5, the reference's SEI decoded-picture-hash oracle
        (sei.cc:251-270)."""
        return hashlib.md5(np.ascontiguousarray(self.planes[idx]).tobytes()).hexdigest()

    def to_yuv_bytes(self):
        return b"".join(np.ascontiguousarray(p).tobytes() for p in self.planes)


def new_decoder(**kw) -> Decoder:
    return Decoder(**kw)


def push_data(dec: Decoder, data: bytes, pts=None):
    dec.push_data(data, pts)


def push_nal(dec: Decoder, data: bytes, pts=None):
    dec.push_nal(data, pts)


def flush_data(dec: Decoder):
    dec.flush()


def decode(dec: Decoder) -> bool:
    return dec.decode()


def get_next_picture(dec: Decoder):
    p = dec.get_next_picture()
    if p is None:
        return None
    return DecodedPicture(poc=p.poc, planes=p.output_planes)


def decode_stream(data: bytes, **kw):
    """Convenience: decode a whole Annex-B stream, return list of pictures."""
    dec = new_decoder(**kw)
    dec.push_data(data)
    dec.flush()
    out = []
    while True:
        more = dec.decode()
        while True:
            pic = get_next_picture(dec)
            if pic is None:
                break
            out.append(pic)
        if not more:
            break
    return out
