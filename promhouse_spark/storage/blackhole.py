"""Blackhole storage (S14): accepts writes, returns empty results — the
API-test / throughput-measurement backend (``storages/blackhole/blackhole.go:57-69``)."""

from __future__ import annotations

from typing import Sequence

from promhouse_spark.models import Query, TimeSeries
from promhouse_spark.storage.base import Storage


class BlackholeStorage(Storage):
    def __init__(self) -> None:
        self.written_series = 0
        self.written_samples = 0

    def write(self, timeseries: Sequence[TimeSeries]) -> None:
        self.written_series += len(timeseries)
        self.written_samples += sum(len(ts.samples) for ts in timeseries)

    def read(self, queries: Sequence[Query]) -> list[list[TimeSeries]]:
        return [[] for _ in queries]  # one empty result per query (O1)
