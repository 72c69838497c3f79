"""Label canonicalization + JSON codec (X2/X3/T2).

The reference persists labels as a JSON object string produced by a
hand-rolled, order-preserving, escape-correct marshaller
(``storages/clickhouse/json.go:27-65``) and parses back with a standard JSON
map decode (``json.go:69-82``). Labels are canonically sorted by name before
fingerprinting/marshalling (``utils/timeseries/timeseries.go:26-28``).

We keep labels as a real Spark ``MapType`` at rest and only serialize at API
edges. The marshaller here mirrors the reference's canonical form (sorted
names, minimal escapes) but is standard-correct JSON — a superset: the
reference escapes only ``\\ " \\n \\r \\t`` and has a known unicode FIXME
(``json.go:39-41``); equality tests therefore compare parsed maps, exactly as
the reference's own tests do (``storages/clickhouse/json_test.go:63-71``).
"""

from __future__ import annotations

import json
from typing import Iterable, Mapping

from pyspark.sql import Column, functions as F

from promhouse_spark.models import Label


def sort_labels(labels: Iterable[Label]) -> list[Label]:
    """Canonical order: by name (timeseries.go:26-28)."""
    return sorted(labels, key=lambda l: l.name)


_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def _escape(s: str) -> str:
    # Reference escape set (json.go:39-60). Control characters below 0x20
    # other than \n\r\t would produce invalid JSON in the reference (its
    # documented FIXME); we emit \uXXXX for them to stay standard-correct.
    out = []
    for ch in s:
        if ch in _ESCAPES:
            out.append(_ESCAPES[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def marshal_labels(labels: Mapping[str, str] | Iterable[Label]) -> str:
    """Canonical JSON object of a label set, names sorted (json.go:27-65)."""
    if isinstance(labels, Mapping):
        items = sorted(labels.items())
    else:
        items = [(l.name, l.value) for l in sort_labels(list(labels))]
    parts = (f'"{_escape(n)}":"{_escape(v)}"' for n, v in items)
    return "{" + ",".join(parts) + "}"


def unmarshal_labels(s: str) -> dict[str, str]:
    """JSON object string → label map (json.go:69-82)."""
    m = json.loads(s)
    if not isinstance(m, dict):
        raise ValueError(f"labels JSON must be an object, got {type(m).__name__}")
    return {str(k): str(v) for k, v in m.items()}


def labels_map_to_json(col: Column | str) -> Column:
    """Spark-side canonical JSON of a MapType labels column.

    Sorts entries by key first so output is order-stable regardless of map
    build order (the canonical form the reference maintains by construction).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_json(F.map_from_entries(F.array_sort(F.map_entries(c))))


def labels_json_to_map(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, "map<string,string>")


def label_replace(
    labels: Column | str,
    dst: str,
    replacement: str,
    src: str,
    regex: str,
) -> Column:
    """PromQL ``label_replace(v, dst, replacement, src, regex)`` over a
    MapType labels column (prometheus/promql/functions.go
    funcLabelReplace): if ``regex`` matches the ENTIRE value of label
    ``src`` (absent label ≡ ""), set ``dst`` to the replacement with $N
    capture expansions; an empty result drops ``dst``; no match leaves the
    series untouched. Pure map expressions — no shuffle, no UDF.

    ``replacement`` uses Java's ``$1`` capture syntax (same as PromQL);
    a DuckDB oracle writes the same capture as ``\\1`` — RE2 dialect."""
    c = F.col(labels) if isinstance(labels, str) else labels
    srcv = F.coalesce(F.element_at(c, F.lit(src)), F.lit(""))
    anchored = f"^(?:{regex})$"
    matched = srcv.rlike(anchored)
    newv = F.regexp_replace(srcv, anchored, replacement)
    base = F.map_filter(c, lambda k, _: k != F.lit(dst))
    replaced = F.when(newv == "", base).otherwise(
        F.map_concat(base, F.create_map(F.lit(dst), newv))
    )
    return F.when(matched, replaced).otherwise(c)


def label_join(
    labels: Column | str, dst: str, sep: str, *srcs: str
) -> Column:
    """PromQL ``label_join(v, dst, sep, srcs...)``: set ``dst`` to the
    values of ``srcs`` joined by ``sep`` (absent labels join as "");
    always applies. Map expressions only."""
    c = F.col(labels) if isinstance(labels, str) else labels
    joined = F.concat_ws(
        sep, *[F.coalesce(F.element_at(c, F.lit(s)), F.lit("")) for s in srcs]
    )
    base = F.map_filter(c, lambda k, _: k != F.lit(dst))
    return F.when(joined == "", base).otherwise(
        F.map_concat(base, F.create_map(F.lit(dst), joined))
    )
