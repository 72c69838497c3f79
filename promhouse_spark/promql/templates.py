"""Minimal alert-annotation template expansion (the promtool/Prometheus
``{{ $labels.name }}`` / ``{{ $value }}`` subset).

Prometheus runs full Go text/template with the template functions from
template/template.go; rule files overwhelmingly use just the two value
references, so this expands exactly those — ``{{ $labels.<name> }}`` and
``{{ $value }}``, any interior whitespace — and leaves every other
construct verbatim (documented divergence: no pipelines / humanize /
printf). Substitution is SINGLE-PASS, like Go templates: substituted
data is never re-scanned, so a label whose value contains the literal
text ``{{ $value }}`` stays literal.

``$labels`` refers to the RAW series labels of the alert's sample
(rules/alerting.go builds template data from smpl.Metric BEFORE merging
rule labels and alertname), and ``$value`` renders like Go ``%v`` of a
float64 (strconv 'g': "5", "42.5", "1e-05", "1e+16", "+Inf", "NaN").
"""

from __future__ import annotations

import re

_TMPL_RE = re.compile(
    r"\{\{\s*\$(?:labels\.([A-Za-z_][A-Za-z0-9_]*)|(value))\s*\}\}"
)


def format_template_value(v: float | None) -> str | None:
    """Go ``%v`` rendering of a float64 — strconv 'g' with shortest
    precision. Go's ftoa.go uses eprec=21 for the shortest case: fixed
    notation while -4 ≤ decimal exponent < 21, scientific outside
    ("1e-05", "1e+21"). Python's repr switches to scientific at 1e16, so
    the 1e16–1e21 zone is re-rendered fixed from the SHORTEST digits
    (1.5e18 → "1500000000000000000"), exactly as Go prints it."""
    if v is None:
        return None
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "+Inf"
    if v == float("-inf"):
        return "-Inf"
    r = repr(float(v))
    if "e" in r:
        exp10 = int(r.partition("e")[2])
        if -4 <= exp10 < 21:
            from decimal import Decimal

            out = format(Decimal(r), "f")
            return out[:-2] if out.endswith(".0") else out
        return r
    if v == int(v):
        import math

        if v == 0 and math.copysign(1.0, v) < 0:
            return "-0"  # Go %v keeps the IEEE sign of negative zero
        return str(int(v))
    return r


def expand(text: str, labels: dict, value: float | str | None) -> str:
    """Substitute $labels.<name> and $value references in ONE pass;
    unknown labels expand to "" (Go template's missing-map-key behavior);
    a None value leaves ``{{ $value }}`` verbatim."""

    def sub(m: re.Match) -> str:
        if m.group(2):  # $value
            return str(value) if value is not None else m.group(0)
        return str(labels.get(m.group(1), ""))

    return _TMPL_RE.sub(sub, text)


def expand_annotations(
    annotations: dict, labels: dict, value: float | str | None
) -> dict:
    return {
        str(k): expand(str(v), labels, value)
        for k, v in (annotations or {}).items()
    }
