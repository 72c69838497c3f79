"""Bit-exact FNV-1a/64 series fingerprint (X1).

The reference computes the Prometheus-compatible fingerprint of a label set by
folding, per label *sorted by name*, ``name, 0xFF, value, 0xFF`` through
FNV-1a/64 (``utils/timeseries/fingerprint.go:39-76``; oracle pins at
``utils/timeseries/fingerprint_test.go:27-46``):

- empty label set → offset basis ``14695981039346656037``;
- ``{__name__=http_requests_total, code=200, handler=query}`` →
  ``0x145426e4f81508d1``.

Bit-exactness matters for data migration compatibility (``README.md:56-58``):
Spark's ``xxhash64``/``hash`` are NOT substitutes. Unsigned 64-bit values are
carried in Spark ``LongType`` as the same two's-complement bit pattern.

This is deliberately a Pandas UDF (Arrow-vectorized batch transfer) rather
than a row-at-a-time Python UDF; it is only on the write/ingest path — reads
never recompute fingerprints.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import pandas as pd
from pyspark.sql import functions as F, types as T

FNV_OFFSET_BASIS = 14695981039346656037  # 0xCBF29CE484222325
FNV_PRIME = 1099511628211  # 0x100000001B3
_MASK64 = (1 << 64) - 1
_SEP = b"\xff"


def _fold(h: int, data: bytes) -> int:
    for b in data:
        h ^= b
        h = (h * FNV_PRIME) & _MASK64
    return h


def fingerprint(labels: Mapping[str, str] | Iterable[tuple[str, str]]) -> int:
    """Unsigned 64-bit fingerprint of a label set (fingerprint.go:63-76)."""
    items = labels.items() if isinstance(labels, Mapping) else labels
    h = FNV_OFFSET_BASIS
    for name, value in sorted(items):
        h = _fold(h, name.encode("utf-8"))
        h = _fold(h, _SEP)
        h = _fold(h, value.encode("utf-8"))
        h = _fold(h, _SEP)
    return h


def to_signed64(u: int) -> int:
    """Reinterpret unsigned 64-bit as two's-complement (for LongType)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def to_unsigned64(s: int) -> int:
    return s + (1 << 64) if s < 0 else s


def fingerprint_signed(labels: Mapping[str, str] | Iterable[tuple[str, str]]) -> int:
    return to_signed64(fingerprint(labels))


@F.pandas_udf(T.LongType())
def fingerprint_map_udf(labels: pd.Series) -> pd.Series:
    """Vectorized fingerprint over a MapType(str,str) column → signed int64.

    Arrow hands map columns to pandas as lists of (key, value) tuples (or
    dicts depending on the conversion); handle both.
    """
    out = []
    for m in labels:
        if m is None:
            out.append(to_signed64(FNV_OFFSET_BASIS))
            continue
        items = m.items() if isinstance(m, Mapping) else m
        out.append(to_signed64(fingerprint(items)))
    return pd.Series(out, dtype="int64")
