"""Gorilla XOR chunk codec — the Prometheus TSDB sample-compression format.

Bit-exact re-implementation of the public ``prometheus/tsdb/chunkenc``
XOR chunk (xor.go), which itself implements Facebook's Gorilla encoding
(Pelkonen et al., VLDB 2015, §4.1): delta-of-delta timestamps with
prefix-coded bit widths, XOR'd float values with leading/trailing-zero
windows. This is what a Prometheus remote-read STREAMED_XOR_CHUNKS
response carries in ``Chunk.data`` — the reference ignores that protocol
entirely (``handlers/prom.go:184-186`` drops read hints and always
answers sampled), so this is beyond-reference, spec-first surface.

Layout (xor.go):

  [uint16 BE sample count][bitstream]
  sample 0:  timestamp as signed varint (zigzag), value as raw 64 bits
  sample 1:  tDelta as unsigned varint, value XOR-coded
  sample n:  dod = tDelta_n - tDelta_{n-1} prefix-coded:
               '0'                       dod == 0
               '10'   + 14 bits          dod ∈ [-8191, 8192]
               '110'  + 17 bits          dod ∈ [-65535, 65536]
               '1110' + 20 bits          dod ∈ [-524287, 524288]
               '1111' + 64 bits          otherwise
             value XOR-coded:
               '0'                       xor == 0
               '10'   + reuse window     leading/trailing fit the previous
               '11'   + 5b leading + 6b sigbits (64 stored as 0) + sigbits

Bits are MSB-first within bytes, exactly like Prometheus's bstream.
Varints are the Go ``binary.PutVarint``/``PutUvarint`` byte forms written
through the (possibly unaligned) bit writer.
"""

from __future__ import annotations

import struct
from typing import Iterable, Sequence

_MASK64 = (1 << 64) - 1

# Chunk.type enum in the public prometheus/prompb types.proto
CHUNK_TYPE_XOR = 1


class BitWriter:
    """MSB-first bit writer (prometheus/tsdb/chunkenc/bstream.go)."""

    def __init__(self) -> None:
        self._bytes = bytearray()
        self._acc = 0  # pending sub-byte bits, MSB side
        self._nacc = 0

    def write_bit(self, bit: int) -> None:
        self.write_bits(1 if bit else 0, 1)

    def write_bits(self, value: int, nbits: int) -> None:
        # accumulate then flush whole bytes — constant work per call
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nacc += nbits
        while self._nacc >= 8:
            self._nacc -= 8
            self._bytes.append((self._acc >> self._nacc) & 0xFF)
        self._acc &= (1 << self._nacc) - 1

    def write_byte(self, b: int) -> None:
        self.write_bits(b, 8)

    def write_uvarint(self, u: int) -> None:
        while True:
            if u >= 0x80:
                self.write_byte((u & 0x7F) | 0x80)
                u >>= 7
            else:
                self.write_byte(u)
                return

    def write_varint(self, n: int) -> None:
        # Go binary.PutVarint: zigzag then uvarint. Python's arithmetic
        # shift makes the two's-complement formula exact for negatives:
        # n >> 63 is -1, and x ^ -1 == ~x on arbitrary-precision ints.
        self.write_uvarint((n << 1) ^ (n >> 63))

    def bytes(self) -> bytes:
        if self._nacc:
            return bytes(self._bytes) + bytes(
                [(self._acc << (8 - self._nacc)) & 0xFF]
            )
        return bytes(self._bytes)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._nbits = len(data) * 8
        self._pos = 0  # bit position

    def read_bit(self) -> int:
        pos = self._pos
        if pos >= self._nbits:
            raise ValueError("chunkenc: bitstream exhausted")
        self._pos = pos + 1
        return (self._data[pos >> 3] >> (7 - (pos & 7))) & 1

    def read_bits(self, nbits: int) -> int:
        # windowed extraction: one int.from_bytes over the covering byte
        # span + shift/mask — constant work per call instead of per bit
        pos = self._pos
        end = pos + nbits
        if end > self._nbits:
            raise ValueError("chunkenc: bitstream exhausted")
        byte_start = pos >> 3
        byte_end = (end + 7) >> 3
        window = int.from_bytes(self._data[byte_start:byte_end], "big")
        tail = byte_end * 8 - end
        self._pos = end
        return (window >> tail) & ((1 << nbits) - 1)

    def read_byte(self) -> int:
        return self.read_bits(8)

    def read_uvarint(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.read_byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ValueError("chunkenc: uvarint too long")

    def read_varint(self) -> int:
        u = self.read_uvarint()
        return (u >> 1) ^ -(u & 1)


def _float_bits(v: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", v))[0]


def _bits_float(b: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", b & _MASK64))[0]


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def _bit_range(x: int, nbits: int) -> bool:
    """xor.go bitRange: does x fit nbits as Prometheus defines it
    (asymmetric: [-(2^(n-1))+1, 2^(n-1)])."""
    return -((1 << (nbits - 1)) - 1) <= x <= (1 << (nbits - 1))


def _xor_write(w: BitWriter, value: float, prev_bits: int, leading: int, trailing: int):
    """xor.go xorWrite. Returns (new_leading, new_trailing)."""
    cur = _float_bits(value)
    delta = cur ^ prev_bits
    if delta == 0:
        w.write_bit(0)
        return leading, trailing
    w.write_bit(1)
    new_leading = min(_clz64(delta), 31)  # clamped: 5-bit field
    new_trailing = _ctz64(delta)
    # reuse the previous window when the xor fits inside it
    if leading != 0xFF and new_leading >= leading and new_trailing >= trailing:
        w.write_bit(0)
        w.write_bits(delta >> trailing, 64 - leading - trailing)
        return leading, trailing
    w.write_bit(1)
    w.write_bits(new_leading, 5)
    sigbits = 64 - new_leading - new_trailing
    w.write_bits(sigbits & 0x3F, 6)  # 64 encodes as 0
    w.write_bits(delta >> new_trailing, sigbits)
    return new_leading, new_trailing


def _xor_read(r: BitReader, prev_bits: int, leading: int, trailing: int):
    """Returns (value_bits, leading, trailing)."""
    if r.read_bit() == 0:
        return prev_bits, leading, trailing
    if r.read_bit() == 0:
        sigbits = 64 - leading - trailing
    else:
        leading = r.read_bits(5)
        sigbits = r.read_bits(6)
        if sigbits == 0:
            sigbits = 64
        trailing = 64 - leading - sigbits
    bits = r.read_bits(sigbits)
    return prev_bits ^ (bits << trailing), leading, trailing


def encode_xor_chunk(samples: Sequence[tuple[int, float]]) -> bytes:
    """Encode (timestamp_ms, value) pairs — MUST be sorted by timestamp —
    into one XOR chunk, byte-compatible with prometheus/tsdb/chunkenc."""
    if len(samples) > 0xFFFF:
        raise ValueError("chunkenc: a chunk holds at most 65535 samples")
    w = BitWriter()
    prev_t = 0
    prev_delta = 0
    prev_bits = 0
    leading, trailing = 0xFF, 0
    for i, (t, v) in enumerate(samples):
        t = int(t)
        if i == 0:
            w.write_varint(t)
            w.write_bits(_float_bits(v), 64)
            prev_bits = _float_bits(v)
        elif i == 1:
            delta = t - prev_t
            if delta < 0:
                raise ValueError("chunkenc: timestamps must be sorted")
            w.write_uvarint(delta)
            leading, trailing = _xor_write(w, v, prev_bits, leading, trailing)
            prev_bits = _float_bits(v)
            prev_delta = delta
        else:
            delta = t - prev_t
            if delta < 0:
                raise ValueError("chunkenc: timestamps must be sorted")
            dod = delta - prev_delta
            if dod == 0:
                w.write_bit(0)
            elif _bit_range(dod, 14):
                w.write_bits(0b10, 2)
                w.write_bits(dod, 14)
            elif _bit_range(dod, 17):
                w.write_bits(0b110, 3)
                w.write_bits(dod, 17)
            elif _bit_range(dod, 20):
                w.write_bits(0b1110, 4)
                w.write_bits(dod, 20)
            else:
                w.write_bits(0b1111, 4)
                w.write_bits(dod, 64)
            leading, trailing = _xor_write(w, v, prev_bits, leading, trailing)
            prev_bits = _float_bits(v)
            prev_delta = delta
        prev_t = t
    return struct.pack(">H", len(samples)) + w.bytes()


def _sign_extend(u: int, nbits: int) -> int:
    """Undo the asymmetric-bucket encoding (xor.go readBits consumers):
    upstream negates only when bits > 1<<(sz-1), because the bucket is
    [-(2^(n-1))+1, 2^(n-1)] — the value 2^(n-1) itself is POSITIVE.
    Plain two's-complement (negate at >=) would round-trip a dod of
    exactly 8192/65536/524288 to its negative.  The 64-bit escape
    bucket is symmetric two's complement (upstream writes int64 raw)."""
    if nbits == 64:
        if u >> 63:
            return u - (1 << 64)
        return u
    if u > (1 << (nbits - 1)):
        return u - (1 << nbits)
    return u


def decode_xor_chunk(data: bytes) -> list[tuple[int, float]]:
    """Decode one XOR chunk back to (timestamp_ms, value) pairs."""
    if len(data) < 2:
        raise ValueError("chunkenc: truncated chunk header")
    (n,) = struct.unpack(">H", data[:2])
    r = BitReader(data[2:])
    out: list[tuple[int, float]] = []
    t = 0
    delta = 0
    bits = 0
    leading, trailing = 0, 0
    for i in range(n):
        if i == 0:
            t = r.read_varint()
            bits = r.read_bits(64)
        elif i == 1:
            delta = r.read_uvarint()
            t += delta
            bits, leading, trailing = _xor_read(r, bits, leading, trailing)
        else:
            # prefix: count leading 1-bits, stopping at the first 0 or at 4
            code = 0
            while code < 4 and r.read_bit():
                code += 1
            if code == 0:
                dod = 0
            elif code == 1:
                dod = _sign_extend(r.read_bits(14), 14)
            elif code == 2:
                dod = _sign_extend(r.read_bits(17), 17)
            elif code == 3:
                dod = _sign_extend(r.read_bits(20), 20)
            else:
                dod = _sign_extend(r.read_bits(64), 64)
            delta += dod
            t += delta
            bits, leading, trailing = _xor_read(r, bits, leading, trailing)
        out.append((t, _bits_float(bits)))
    return out


# --------------------------------------------------------------- framing
# Streamed remote-read frames (public prometheus/storage/remote/chunked.go):
# each ChunkedReadResponse message is sent as
#   uvarint(len(msg)) + crc32c(msg) as 4 bytes BE + msg
# with NO snappy layer — the chunk payloads are already XOR-compressed.

_CRC32C_POLY = 0x82F63B78  # Castagnoli, reflected


def _crc32c_table() -> list[int]:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ _CRC32C_POLY if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _uvarint_bytes(u: int) -> bytes:
    out = bytearray()
    while True:
        if u >= 0x80:
            out.append((u & 0x7F) | 0x80)
            u >>= 7
        else:
            out.append(u)
            return bytes(out)


def frame_message(msg: bytes) -> bytes:
    """One streamed-read frame: uvarint length + CRC32C (BE) + payload."""
    return _uvarint_bytes(len(msg)) + struct.pack(">I", crc32c(msg)) + msg


def iter_frames(buf: bytes):
    """Yield the payloads of a concatenated frame stream, verifying each
    CRC. Raises ValueError on truncation or checksum mismatch."""
    pos = 0
    n = len(buf)
    while pos < n:
        size = 0
        shift = 0
        while True:
            if pos >= n:
                raise ValueError("chunked frame: truncated length")
            b = buf[pos]
            pos += 1
            size |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("chunked frame: length varint too long")
        if pos + 4 + size > n:
            raise ValueError("chunked frame: truncated body")
        (want,) = struct.unpack(">I", buf[pos : pos + 4])
        payload = buf[pos + 4 : pos + 4 + size]
        if crc32c(payload) != want:
            raise ValueError("chunked frame: CRC mismatch")
        pos += 4 + size
        yield payload


def chunk_samples(
    samples: Iterable[tuple[int, float]], max_samples: int = 120
) -> list[tuple[int, int, bytes]]:
    """Cut a sorted sample run into XOR chunks of at most ``max_samples``
    (Prometheus's head cuts at 120 — two hours of 1-minute scrapes; the
    Gorilla paper's compression ratios hold at that size). Returns
    (min_time_ms, max_time_ms, chunk_bytes) triples."""
    buf: list[tuple[int, float]] = []
    out: list[tuple[int, int, bytes]] = []
    for s in samples:
        buf.append(s)
        if len(buf) >= max_samples:
            out.append((buf[0][0], buf[-1][0], encode_xor_chunk(buf)))
            buf = []
    if buf:
        out.append((buf[0][0], buf[-1][0], encode_xor_chunk(buf)))
    return out
