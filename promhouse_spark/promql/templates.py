"""Minimal alert-annotation template expansion (the promtool/Prometheus
``{{ $labels.name }}`` / ``{{ $value }}`` subset).

Prometheus runs full Go text/template with the template functions from
template/template.go; rule files overwhelmingly use just the two value
references, so this expands exactly those — ``{{ $labels.<name> }}`` and
``{{ $value }}``, any interior whitespace — and leaves every other
construct verbatim (documented divergence: no pipelines / humanize /
printf)."""

from __future__ import annotations

import re

_LABEL_RE = re.compile(r"\{\{\s*\$labels\.([a-zA-Z_][a-zA-Z0-9_]*)\s*\}\}")
_VALUE_RE = re.compile(r"\{\{\s*\$value\s*\}\}")


def expand(text: str, labels: dict, value: float | str | None) -> str:
    """Substitute $labels.<name> and $value references; unknown labels
    expand to "" (Go template's missing-map-key behavior)."""
    out = _LABEL_RE.sub(lambda m: str(labels.get(m.group(1), "")), text)
    if value is not None:
        out = _VALUE_RE.sub(str(value), out)
    return out


def expand_annotations(
    annotations: dict, labels: dict, value: float | str | None
) -> dict:
    return {
        str(k): expand(str(v), labels, value)
        for k, v in (annotations or {}).items()
    }
