"""NHCB (custom-bucket native histograms) → classic-bucket series.

Prometheus 3's ``--enable-feature=native-histograms`` converts classic
histograms to NHCB (native histograms with custom buckets, schema -53):
``custom_values`` holds the classic upper boundaries, positive bucket
index ``i`` counts observations in ``(custom_values[i-1],
custom_values[i]]`` (index 0 is ``(-Inf, custom_values[0]]``), and an
index equal to ``len(custom_values)`` is the overflow ``(last, +Inf)``
bucket. The exponential analytics tier
(:mod:`promhouse_spark.operators.nativehist`) can't represent those
boundaries, so Remote-Write 2.0 ingestion maps each NHCB sample BACK to
the classic exposition it came from — ``<name>_bucket{le=...}``
cumulative counters (always including ``le="+Inf"``), ``<name>_sum``,
``<name>_count`` — which the whole float query surface (PromQL
``histogram_quantile`` over classic buckets included) already serves.
Reference parity note: the reference's prompb has no histograms at all
(prompb/*.proto); this surface follows public prometheus
model/histogram/nhcb semantics.
"""

from __future__ import annotations

from promhouse_spark.models import Label, NativeHistogram, Sample, TimeSeries

__all__ = ["is_nhcb", "nhcb_to_classic"]


def is_nhcb(h: NativeHistogram) -> bool:
    return bool(h.custom_values)


def _fmt_le(v: float) -> str:
    """Classic ``le`` rendering: Go strconv.FormatFloat(v, 'g', -1, 64)
    shortest form — Python repr matches for round-trippable doubles,
    minus the ``.0`` suffix on integral values."""
    if v == float("inf"):
        return "+Inf"
    if v == int(v) and abs(v) < 2**53:
        return str(int(v))
    return repr(v)


def nhcb_to_classic(ts: TimeSeries) -> tuple[TimeSeries, list[TimeSeries]]:
    """Split ``ts`` into (the series minus its NHCB samples, the derived
    classic series). Raises ``ValueError`` on NHCB samples the classic
    mapping can't express (no ``__name__``, negative buckets, or a bucket
    index beyond the boundary list) — the HTTP layer answers 400.

    Counts in the model are per-bucket absolute; classic buckets are
    CUMULATIVE, so bucket ``le=cv[i]`` carries ``sum(counts[0..i])`` and
    ``le="+Inf"`` carries the histogram's total ``count`` (zero-bucket
    observations included, matching upstream's nhcb conversion where the
    zero bucket folds into the lowest boundary's count via the implicit
    ``(-Inf, cv[0]]`` range)."""
    nhcb = [h for h in ts.histograms if is_nhcb(h)]
    if not nhcb:
        return ts, []
    labels = {l.name: l.value for l in ts.labels}
    base = labels.pop("__name__", None)
    if base is None:
        raise ValueError("NHCB series without __name__ cannot map to classic")
    derived: dict[tuple[str, ...], TimeSeries] = {}

    def emit(name: str, extra: list[Label], t_ms: int, value: float) -> None:
        key = (name, *(f"{l.name}={l.value}" for l in extra))
        series = derived.get(key)
        if series is None:
            series = TimeSeries(
                labels=sorted(
                    [Label("__name__", name), *extra]
                    + [Label(n, v) for n, v in labels.items()],
                    key=lambda l: l.name,
                ),
                samples=[],
            )
            derived[key] = series
        series.samples.append(Sample(value=value, timestamp_ms=t_ms))

    for h in nhcb:
        if h.negative:
            raise ValueError("NHCB histogram with negative buckets")
        n = len(h.custom_values)
        counts = dict(h.positive)
        if counts and max(counts) > n:
            raise ValueError(
                f"NHCB bucket index {max(counts)} beyond {n} boundaries"
            )
        # Zero-bucket observations sit at ~0, so they belong to every
        # cumulative bucket whose upper bound covers 0 (ub >= 0) — with
        # the usual non-negative boundaries that is ALL buckets, i.e.
        # seeding the cumulative sum. Omitting this undercounts every
        # le-bucket relative to _count/le="+Inf" and skews
        # histogram_quantile whenever zero_count > 0.
        zc = float(h.zero_count or 0.0)
        cum = 0.0
        for i, ub in enumerate(h.custom_values):
            cum += counts.get(i, 0.0)
            emit(
                "%s_bucket" % base,
                [Label("le", _fmt_le(ub))],
                h.timestamp_ms,
                cum + (zc if ub >= 0 else 0.0),
            )
        emit("%s_bucket" % base, [Label("le", "+Inf")], h.timestamp_ms, float(h.count))
        emit("%s_sum" % base, [], h.timestamp_ms, float(h.sum))
        emit("%s_count" % base, [], h.timestamp_ms, float(h.count))

    remaining = TimeSeries(
        labels=ts.labels,
        samples=ts.samples,
        histograms=[h for h in ts.histograms if not is_nhcb(h)],
        exemplars=ts.exemplars,
    )
    return remaining, list(derived.values())
