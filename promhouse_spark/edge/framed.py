"""Framed file format (S8/S9): the promload dump/restore format.

Per ``cmd/promload/file.go:63-155``: a stream of frames, each
``uint32 big-endian length`` + ``snappy(protobuf(TimeSeries))``, one
TimeSeries per frame, EOF-terminated. Progress = file offset.
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Iterable, Iterator

from promhouse_spark.edge import prompb, snappy_codec
from promhouse_spark.models import TimeSeries


def write_frames(f: BinaryIO, series: Iterable[TimeSeries]) -> int:
    """Append TimeSeries frames; returns the number written."""
    n = 0
    for ts in series:
        payload = snappy_codec.compress(prompb.encode_timeseries(ts))
        f.write(struct.pack(">I", len(payload)))
        f.write(payload)
        n += 1
    return n


def read_frames(f: BinaryIO) -> Iterator[TimeSeries]:
    """Length-prefixed read loop, EOF-terminated (file.go:63-122)."""
    while True:
        header = f.read(4)
        if not header:
            return
        if len(header) < 4:
            raise ValueError("framed: truncated frame header")
        (size,) = struct.unpack(">I", header)
        payload = f.read(size)
        if len(payload) < size:
            raise ValueError("framed: truncated frame payload")
        yield prompb.decode_timeseries(snappy_codec.decompress(payload))
