"""Driver-side quantization matching the SQL oracle's rounding mode.

The verified-training operators (operators/hashlr.py, operators/kmeans.py)
quantize the model state to 1e-``digits`` after every iteration on BOTH
engines so cross-engine float drift (~1e-15 from aggregation order)
cannot accumulate across the trajectory. That contract requires both
engines to round the SAME WAY at a midpoint: DuckDB's ``round()`` on
DOUBLE is half-AWAY-from-zero (``std::round`` semantics: round(-2.5,0)
= -3), while Python's builtin ``round()`` is half-to-EVEN (round(-2.5)
= -2). At an exact 1e-digits midpoint the two would diverge and the
whole trajectory hash would flip — so the Spark-side trainers must use
this helper, never the builtin.
"""

from __future__ import annotations

import math


def quantize(x: float, digits: int) -> float:
    """Round half-away-from-zero to ``digits`` decimal places — the same
    mode DuckDB (and ANSI SQL engines generally) use for ``round(x, d)``
    on DOUBLE, i.e. C ``std::round(x * 10^d) / 10^d``."""
    s = 10.0 ** digits
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s
