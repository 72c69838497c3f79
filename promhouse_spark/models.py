"""Logical data model: Label / Sample / TimeSeries / Matcher / Query.

Mirrors the reference's engine-internal model (``storages/base/base.go:43-138``
and ``prompb/prompb.proto:17-30``) as plain Python dataclasses. These are the
in-flight row-oriented shapes; the at-rest shape is the two-table columnar
model in :mod:`promhouse_spark.schemas`.
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field
from typing import Mapping, Sequence


@dataclass(frozen=True, order=True)
class Label:
    """A single label pair (``prompb/prompb.proto:17-20``)."""

    name: str
    value: str


@dataclass(frozen=True)
class Sample:
    """One sample: float64 value at int64 epoch-milliseconds
    (``prompb/prompb.proto:22-25``)."""

    value: float
    timestamp_ms: int


@dataclass
class Exemplar:
    """One exemplar (public prometheus/prompb types.proto ``Exemplar``,
    remote-write ≥ Prometheus 2.27): a sampled observation annotated with
    trace-correlation labels (canonically ``trace_id``). Attached to a
    TimeSeries (prompb TimeSeries field 3 — beyond the reference's
    2017-era proto, which predates exemplars)."""

    labels: list[Label] = field(default_factory=list)
    value: float = 0.0
    timestamp_ms: int = 0

    def labels_map(self) -> dict[str, str]:
        return {l.name: l.value for l in self.labels}


@dataclass
class NativeHistogram:
    """One native-histogram sample (public prometheus/prompb types.proto
    ``Histogram``, remote-write ≥ Prometheus 2.40), with the sparse
    span/delta wire encoding EXPANDED to explicit (bucket index, absolute
    count) pairs — the shape the analytics tier consumes
    (:mod:`promhouse_spark.operators.nativehist`).

    Bucket ``idx`` at ``schema`` s covers ``(2^((idx-1)·2^-s),
    2^(idx·2^-s)]`` for positive buckets (mirrored for negative); the
    zero bucket covers ``[-zero_threshold, zero_threshold]``. Counts are
    floats so both integer and float histograms fit one model."""

    timestamp_ms: int = 0
    count: float = 0.0
    sum: float = 0.0
    schema: int = 0
    zero_threshold: float = 0.0
    zero_count: float = 0.0
    positive: list[tuple[int, float]] = field(default_factory=list)
    negative: list[tuple[int, float]] = field(default_factory=list)
    is_float: bool = False  # wire used the *_float/absolute-counts form
    # Remote-Write 2.0 custom-bucket (NHCB) boundaries (write.v2 Histogram
    # field 16). Non-empty ⇒ ``positive`` indexes buckets BETWEEN these
    # boundaries instead of the exponential grid; the exponential
    # analytics tier rejects such histograms explicitly.
    custom_values: list[float] = field(default_factory=list)


@dataclass
class TimeSeries:
    """A labelled series of samples (``prompb/prompb.proto:27-30``).

    ``labels`` are canonically kept sorted by name (see
    :func:`promhouse_spark.functions.labels.sort_labels`); samples sorted by
    timestamp in query results (``prompb/prompb.proto:60``).
    ``histograms`` carries native-histogram samples (prompb TimeSeries
    field 4) and ``exemplars`` trace-annotated observations (field 3) —
    both beyond the reference's 2017-era proto, which predates them."""

    labels: list[Label] = field(default_factory=list)
    samples: list[Sample] = field(default_factory=list)
    histograms: list[NativeHistogram] = field(default_factory=list)
    exemplars: list[Exemplar] = field(default_factory=list)

    def labels_map(self) -> dict[str, str]:
        return {l.name: l.value for l in self.labels}


class MatchType(enum.Enum):
    """Matcher comparison type (``storages/base/base.go:53-60``)."""

    EQ = "="
    NEQ = "!="
    RE = "=~"
    NRE = "!~"


# The reference anchors regexes exactly like Prometheus does:
# ``regexp.MustCompile("^(?:" + value + ")$")`` (``storages/base/base.go:102-104``).
def anchored(pattern: str) -> str:
    return f"^(?:{pattern})$"


@dataclass(frozen=True)
class Matcher:
    """A single label matcher (``storages/base/base.go:62-82``).

    Semantics (``storages/base/base.go:100-138``):
      - an absent label is equivalent to an empty-string value
        (the shared ``emptyLabel`` at ``base.go:90``);
      - regexes are fully anchored (``base.go:103``).
    """

    name: str
    type: MatchType
    value: str

    def matches(self, labels: Mapping[str, str]) -> bool:
        v = labels.get(self.name, "")
        if self.type is MatchType.EQ:
            return v == self.value
        if self.type is MatchType.NEQ:
            return v != self.value
        # fullmatch ≡ RE2's ^(?:p)$ where $ is end-of-text (no trailing-\n
        # slack), and it keeps inline flags like (?i)/(?s) legal at pattern
        # start — Python 3.11 rejects global flags mid-pattern, which the
        # literal ^(?: prefix would force.
        ok = re.fullmatch(self.value, v) is not None
        if self.type is MatchType.RE:
            return ok
        return not ok

    def __repr__(self) -> str:  # debug render, base.go:62-75
        return f'{{{self.name}{self.type.value}"{self.value}"}}'


@dataclass(frozen=True)
class Query:
    """A selection query: inclusive time range + conjunctive matchers
    (``storages/base/base.go:43-47``)."""

    start_ms: int
    end_ms: int
    matchers: tuple[Matcher, ...] = ()

    def matches(self, labels: Mapping[str, str]) -> bool:
        """Conjunction over all matchers; empty list selects all
        (``storages/storages_test.go:264-326``)."""
        return all(m.matches(labels) for m in self.matchers)

    def __repr__(self) -> str:
        ms = ",".join(repr(m) for m in self.matchers)
        return f"[{self.start_ms},{self.end_ms},[{ms}]]"


def make_matchers(*specs: tuple[str, str, str] | Matcher) -> tuple[Matcher, ...]:
    """Convenience: ``make_matchers(("__name__", "=", "up"))``."""
    out: list[Matcher] = []
    for s in specs:
        if isinstance(s, Matcher):
            out.append(s)
        else:
            name, op, value = s
            out.append(Matcher(name, MatchType(op), value))
    return tuple(out)
