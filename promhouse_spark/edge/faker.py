"""fake_exporter equivalent (X9): deterministic load-test metric fan-out.

The reference's fake_exporter scrapes one real exporter and re-exposes N
jittered copies for load testing (``cmd/fake_exporter``, default 100
instances, ``main.go:35``). The jitter rule (``faker.go:50-74``):

- NaN/±Inf, 0 and 1 are kept unchanged (flag/staleness semantics);
- other values get ±10% uniform jitter;
- integral inputs stay integral (truncate after jitter).

A seeded RNG makes output reproducible, like the reference's faker tests
(``faker_test.go:85-96``).
"""

from __future__ import annotations

import math
import random
from typing import Iterable, Iterator

from promhouse_spark.models import Label, TimeSeries, Sample


def fake_value(v: float, rng: random.Random) -> float:
    if math.isnan(v) or math.isinf(v) or v in (0.0, 1.0):
        return v
    jittered = v * (0.9 + 0.2 * rng.random())
    if float(v).is_integer():
        return float(int(jittered))
    return jittered


def fan_out(
    series: Iterable[TimeSeries],
    instances: int = 100,
    instance_label: str = "instance",
    seed: int = 42,
) -> Iterator[TimeSeries]:
    """Yield ``instances`` jittered copies of every series, each tagged with
    a synthetic instance label (``fake_exporter`` fans one scrape out to N
    fake hosts)."""
    rng = random.Random(seed)
    materialized = list(series)
    for i in range(instances):
        inst = f"fake-{i}"
        for ts in materialized:
            labels = [l for l in ts.labels if l.name != instance_label]
            labels.append(Label(instance_label, inst))
            yield TimeSeries(
                labels=sorted(labels, key=lambda l: l.name),
                samples=[
                    Sample(value=fake_value(s.value, rng), timestamp_ms=s.timestamp_ms)
                    for s in ts.samples
                ],
            )
