"""MSB-first bit reader over a bytes object, with Exp-Golomb helpers.

Counterpart of the reference's bitreader (/root/reference/libde265/bitstream.h:39-62),
re-implemented from the H.265 spec (clause 9.2) — not a translation: we index a
Python bytes object directly instead of maintaining a 64-bit refill register.
"""


class Bitreader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = 8 * len(data)

    def get_bits(self, n: int) -> int:
        v = 0
        data, pos = self.data, self.pos
        for _ in range(n):
            byte = data[pos >> 3] if (pos >> 3) < len(data) else 0
            v = (v << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v

    def get_bit(self) -> int:
        pos = self.pos
        byte = self.data[pos >> 3] if (pos >> 3) < len(self.data) else 0
        self.pos = pos + 1
        return (byte >> (7 - (pos & 7))) & 1

    def peek_bits(self, n: int) -> int:
        save = self.pos
        v = self.get_bits(n)
        self.pos = save
        return v

    def skip_bits(self, n: int):
        self.pos += n

    def get_uvlc(self) -> int:
        """ue(v) Exp-Golomb (spec 9.2)."""
        zeros = 0
        while self.get_bit() == 0:
            zeros += 1
            if zeros > 63:
                raise ValueError("uvlc too long / corrupted stream")
        if zeros == 0:
            return 0
        return (1 << zeros) - 1 + self.get_bits(zeros)

    def get_svlc(self) -> int:
        """se(v) Exp-Golomb (spec 9.2.2)."""
        v = self.get_uvlc()
        if v == 0:
            return 0
        if v & 1:
            return (v + 1) >> 1
        return -(v >> 1)

    def byte_align(self):
        self.pos = (self.pos + 7) & ~7

    def is_byte_aligned(self) -> bool:
        return (self.pos & 7) == 0

    def bytes_remaining(self) -> int:
        return len(self.data) - ((self.pos + 7) >> 3)

    def byte_pos(self) -> int:
        return (self.pos + 7) >> 3

    def more_rbsp_data(self) -> bool:
        """True if there is RBSP data beyond the rbsp_stop_one_bit (spec 7.2)."""
        # find last byte with any set bit (trailing zero bytes are padding)
        data = self.data
        last = len(data) - 1
        while last >= 0 and data[last] == 0:
            last -= 1
        if last < 0:
            return False
        # position of the rbsp_stop_one_bit = lowest set bit of data[last]
        b = data[last]
        stop_bit_from_msb = 7
        for i in range(8):
            if (b >> i) & 1:
                stop_bit_from_msb = 7 - i
                break
        stop_pos = last * 8 + stop_bit_from_msb
        return self.pos < stop_pos
