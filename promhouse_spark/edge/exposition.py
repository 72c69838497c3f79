"""Prometheus text exposition format parser (X10).

Decodes the ``/metrics`` text format into TimeSeries, the way promload's
exporter source does via ``expfmt`` (``cmd/promload/exporter.go:96-159``):
comment/HELP/TYPE lines skipped, metric lines
``name{label="value",...} value [timestamp_ms]`` become one single-sample
series each with ``__name__`` prepended. Label value escapes: ``\\ \" \n``.

Summary/histogram child series (``_sum``/``_count``/``quantile``/``le``)
need no special casing — they arrive as ordinary sample lines.
"""

from __future__ import annotations

import math
import re
from typing import Iterator

from promhouse_spark.models import Exemplar, Label, Sample, TimeSeries

_METRIC_RE = re.compile(
    r"^(?P<name>[a-zA-Z_:][a-zA-Z0-9_:]*)"
    r"(?:\{(?P<labels>.*)\})?"
    r"\s+(?P<value>[^\s]+)"
    r"(?:\s+(?P<ts>-?\d+))?\s*$"
)
_LABEL_RE = re.compile(r'\s*(?P<name>[a-zA-Z_][a-zA-Z0-9_]*)\s*=\s*"(?P<value>(?:\\.|[^"\\])*)"\s*,?')
# OpenMetrics exemplar suffix: ``… # {labels} value [ts_seconds]``.
# The " # {" separator is required by the OpenMetrics ABNF; a label VALUE
# containing that exact byte sequence would misparse (documented
# limitation of the line-split approach).
_EXEMPLAR_RE = re.compile(
    r"\s#\s\{(?P<elabels>.*)\}\s+(?P<evalue>[^\s]+)"
    r"(?:\s+(?P<ets>[^\s]+))?\s*$"
)


def _unescape(v: str) -> str:
    return v.replace("\\\\", "\x00").replace('\\"', '"').replace("\\n", "\n").replace("\x00", "\\")


def _parse_value(s: str) -> float:
    low = s.lower()
    if low in ("nan",):
        return math.nan
    if low in ("+inf", "inf"):
        return math.inf
    if low == "-inf":
        return -math.inf
    return float(s)


def parse_exposition(text: str, default_timestamp_ms: int = 0) -> Iterator[TimeSeries]:
    """One single-sample TimeSeries per metric line; timestamps default to
    ``default_timestamp_ms`` when absent (the reader restamps scrapes, as
    promload's exporter source does)."""
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        exemplars: list[Exemplar] = []
        em = _EXEMPLAR_RE.search(line)
        if em:
            elabels = [
                Label(lm.group("name"), _unescape(lm.group("value")))
                for lm in _LABEL_RE.finditer(em.group("elabels"))
            ]
            ets_ms = (
                int(round(float(em.group("ets")) * 1000))
                if em.group("ets")
                else default_timestamp_ms
            )
            exemplars = [
                Exemplar(
                    labels=elabels,
                    value=_parse_value(em.group("evalue")),
                    timestamp_ms=ets_ms,
                )
            ]
            line = line[: em.start()].rstrip()
        m = _METRIC_RE.match(line)
        if not m:
            continue  # tolerate junk lines like expfmt's lenient readers
        labels = [Label("__name__", m.group("name"))]
        if m.group("labels"):
            for lm in _LABEL_RE.finditer(m.group("labels")):
                labels.append(Label(lm.group("name"), _unescape(lm.group("value"))))
        ts_ms = int(m.group("ts")) if m.group("ts") else default_timestamp_ms
        yield TimeSeries(
            labels=labels,
            samples=[Sample(value=_parse_value(m.group("value")), timestamp_ms=ts_ms)],
            exemplars=exemplars,
        )


def merge_series(series: Iterator[TimeSeries] | list[TimeSeries]) -> list[TimeSeries]:
    """Merge single-sample series (one per exposition line) into one series
    per label set, samples time-sorted — the shape the write path expects."""
    merged: dict[tuple[tuple[str, str], ...], TimeSeries] = {}
    for ts in series:
        key = tuple(sorted((l.name, l.value) for l in ts.labels))
        cur = merged.get(key)
        if cur is None:
            merged[key] = TimeSeries(
                labels=list(ts.labels),
                samples=list(ts.samples),
                exemplars=list(getattr(ts, "exemplars", ()) or ()),
            )
        else:
            cur.samples.extend(ts.samples)
            cur.exemplars.extend(getattr(ts, "exemplars", ()) or ())
    for ts in merged.values():
        ts.samples.sort(key=lambda s: s.timestamp_ms)
        ts.exemplars.sort(key=lambda e: e.timestamp_ms)
    return list(merged.values())


def render_exposition(series: list[TimeSeries]) -> str:
    """Inverse (fake_exporter-style output, ``cmd/fake_exporter/faker.go``)."""
    lines = []
    for ts in series:
        lm = ts.labels_map()
        name = lm.pop("__name__", "unnamed")
        label_part = ""
        if lm:

            def esc(v: str) -> str:
                return (
                    v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
                )

            inner = ",".join(f'{k}="{esc(v)}"' for k, v in sorted(lm.items()))
            label_part = "{" + inner + "}"
        exemplar_suffix = ""
        for e in getattr(ts, "exemplars", ()) or ():

            def esc2(v: str) -> str:
                return (
                    v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
                )

            einner = ",".join(
                f'{k}="{esc2(v)}"' for k, v in sorted(e.labels_map().items())
            )
            # OpenMetrics exemplar: one per line max — attach to the first
            # sample line; timestamps in SECONDS per the OpenMetrics ABNF
            exemplar_suffix = (
                f" # {{{einner}}} {e.value} {e.timestamp_ms / 1000.0}"
            )
            break
        for i, s in enumerate(ts.samples):
            suffix = exemplar_suffix if i == 0 else ""
            lines.append(f"{name}{label_part} {s.value} {s.timestamp_ms}{suffix}")
    return "\n".join(lines) + "\n"
