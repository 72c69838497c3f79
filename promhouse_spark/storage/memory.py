"""In-memory storage — the functional oracle backend.

Port of the reference's memory backend (``storages/memory/memory.go:36-129``):
a dict of fingerprint → (labels, sorted samples). Used exactly as the
reference uses it — the same test spec runs against this oracle and the Spark
engine and must agree (``storages/storages_test.go:56-75``).
"""

from __future__ import annotations

from typing import Sequence

from promhouse_spark.functions.fingerprint import fingerprint
from promhouse_spark.functions.labels import sort_labels
from promhouse_spark.models import Query, Sample, TimeSeries
from promhouse_spark.storage.base import Storage


class MemoryStorage(Storage):
    def __init__(self) -> None:
        # fingerprint (unsigned) -> (sorted labels, samples sorted by ts)
        self._series: dict[int, TimeSeries] = {}

    def write(self, timeseries: Sequence[TimeSeries]) -> None:
        for ts in timeseries:
            labels = sort_labels(ts.labels)  # memory.go:115
            fp = fingerprint((l.name, l.value) for l in labels)
            cur = self._series.get(fp)
            if cur is None:
                cur = TimeSeries(labels=list(labels), samples=[])
                self._series[fp] = cur
            # keep samples sorted, re-sorting only when append breaks order
            # (memory.go:119-125)
            was_sorted = all(
                cur.samples[i].timestamp_ms <= cur.samples[i + 1].timestamp_ms
                for i in range(len(cur.samples) - 1)
            )
            cur.samples.extend(ts.samples)
            if not (
                was_sorted
                and all(
                    cur.samples[i].timestamp_ms <= cur.samples[i + 1].timestamp_ms
                    for i in range(max(len(cur.samples) - len(ts.samples) - 1, 0), len(cur.samples) - 1)
                )
            ):
                cur.samples.sort(key=lambda s: s.timestamp_ms)
            if getattr(ts, "histograms", None):
                cur.histograms.extend(ts.histograms)
                cur.histograms.sort(key=lambda h: h.timestamp_ms)

    def read(self, queries: Sequence[Query]) -> list[list[TimeSeries]]:
        out: list[list[TimeSeries]] = []
        for q in queries:
            res: list[TimeSeries] = []
            for fp in sorted(self._series):
                ts = self._series[fp]
                if not q.matches(ts.labels_map()):
                    continue
                # inclusive time range both ends (memory.go:81-88)
                samples = [
                    s for s in ts.samples if q.start_ms <= s.timestamp_ms <= q.end_ms
                ]
                hists = [
                    h
                    for h in ts.histograms
                    if q.start_ms <= h.timestamp_ms <= q.end_ms
                ]
                if samples or hists:
                    res.append(
                        TimeSeries(
                            labels=list(ts.labels),
                            samples=samples,
                            histograms=hists,
                        )
                    )
            out.append(res)
        return out
