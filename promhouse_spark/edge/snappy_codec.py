"""Pure-Python snappy block-format codec (S3).

The reference uses snappy for every wire payload (``handlers/prom.go:136-150,
264-277``). This container ships no snappy binding, so this module implements
the public block format (google/snappy format_description.txt):

- ``decompress``: complete — varint preamble + LITERAL/COPY-1/COPY-2/COPY-4
  tags with overlapping-copy semantics;
- ``compress``: spec-valid output using literal elements only (any
  conforming decoder, including C++ snappy, accepts it; it trades ratio for
  zero dependencies — the real compression win in this engine is zstd
  parquet at rest, not the wire hop).
"""

from __future__ import annotations


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint too long")


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decompress(data: bytes) -> bytes:
    expected, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        elem_type = tag & 0x03
        if elem_type == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(data[pos : pos + extra], "little") + 1
                pos += extra
            if pos + length > n:
                raise ValueError("snappy: truncated literal")
            out += data[pos : pos + length]
            pos += length
            continue
        if elem_type == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x07) + 4
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif elem_type == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: invalid copy offset")
        # overlapping copies are legal and byte-serial by definition
        start = len(out) - offset
        for i in range(length):
            out.append(out[start + i])
    if len(out) != expected:
        raise ValueError(f"snappy: length mismatch: got {len(out)}, want {expected}")
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Literal-only snappy stream (valid per format §2: a compressor may
    always emit literals)."""
    out = bytearray(_write_varint(len(data)))
    pos = 0
    n = len(data)
    while pos < n:
        chunk = min(n - pos, 65536)
        if chunk <= 60:
            out.append((chunk - 1) << 2)
        else:
            length_bytes = (chunk - 1).to_bytes(4, "little")
            # strip trailing zero bytes; tag 60+extra encodes byte count
            while len(length_bytes) > 1 and length_bytes[-1] == 0:
                length_bytes = length_bytes[:-1]
            out.append((59 + len(length_bytes)) << 2)
            out += length_bytes
        out += data[pos : pos + chunk]
        pos += chunk
    return bytes(out)
