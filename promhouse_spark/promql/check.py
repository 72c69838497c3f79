"""Static PromQL expression validation — the promtool-check workflow.

Prometheus's parser typechecks as it parses, so ``promtool check rules``
rejects ``rate(m)`` (missing range) or ``clamp(m)`` (wrong arity) without
evaluating anything. Our parser is syntax-only and the equivalent checks
live in the engine's compile path, which needs DataFrames; this module
replays the DATA-FREE subset of those checks over the AST so the server's
``--check-rules`` flag (and rule loading generally) fails at load time,
not at the first ``/api/v1/rules`` request.

The function tables are imported from the engine (``_ARITY``,
``_SIMPLE_OVER_TIME``, ``_VALUE_FUNCS``) so a function added there is
automatically known here; only the structural rules are restated.
"""

from __future__ import annotations

from promhouse_spark.promql.parser import (
    Aggregation,
    BinaryOp,
    Call,
    NumberLiteral,
    RangeSelector,
    StringLiteral,
    Subquery,
    Unary,
    VectorSelector,
    parse,
)

_CMP_OPS = {"==", "!=", ">", "<", ">=", "<="}
_SET_OPS = {"and", "or", "unless"}
_AGG_OPS = {
    "sum", "avg", "min", "max", "count", "group", "stddev", "stdvar",
    "topk", "bottomk", "limitk", "limit_ratio", "count_values", "quantile",
}
_PARAM_AGGS = {"topk", "bottomk", "limitk", "limit_ratio", "count_values", "quantile"}


def _known_functions() -> dict[str, tuple[int, int | None]]:
    from promhouse_spark.promql import engine as E

    known: dict[str, tuple[int, int | None]] = {}
    for name in (
        set(E._SIMPLE_OVER_TIME)
        | set(E._VALUE_FUNCS)
        | {
            "rate", "increase", "delta", "irate", "idelta", "resets",
            "changes", "deriv", "mad_over_time",
            "clamp", "clamp_min", "clamp_max", "round",
            "histogram_quantile", "histogram_count", "histogram_sum",
            "histogram_avg", "histogram_stddev", "histogram_stdvar",
            "histogram_fraction", "label_replace", "label_join",
            "sort", "sort_desc", "sort_by_label", "sort_by_label_desc",
            "quantile_over_time", "predict_linear", "holt_winters",
            "double_exponential_smoothing",
            "scalar", "vector", "absent", "absent_over_time", "timestamp",
            "info", "pi", "time",
            "minute", "hour", "day_of_week", "day_of_month", "month",
            "year", "day_of_year", "days_in_month",
        }
    ):
        known[name] = E.PromQLEngine._ARITY.get(name, (1, 1))
    return known


def _range_arg() -> dict[str, int]:
    """Functions that REQUIRE a range argument (selector or subquery) →
    the argument index that must be the range. Includes the whole
    *_over_time family from the engine's own table."""
    from promhouse_spark.promql import engine as E

    idx = {
        "rate": 0, "increase": 0, "delta": 0, "irate": 0, "idelta": 0,
        "resets": 0, "changes": 0, "deriv": 0, "predict_linear": 0,
        "holt_winters": 0, "double_exponential_smoothing": 0,
        "mad_over_time": 0, "quantile_over_time": 1, "absent_over_time": 0,
    }
    for name in E._SIMPLE_OVER_TIME:
        idx[name] = 0
    return idx


def _is_scalar_literal(node) -> bool:
    if isinstance(node, NumberLiteral):
        return True
    if isinstance(node, Unary):
        return _is_scalar_literal(node.expr)
    return False


def validate(node, top_matrix: bool = False) -> None:
    """Raise ValueError for expressions the engine would reject at compile
    time for structural reasons (unknown function, arity, a range selector
    in a non-range position, bool/set-operator misuse, non-literal
    parameters where literals are required). ``top_matrix`` permits a
    matrix-typed expression (bare range selector / subquery) at the top
    level — valid for ad-hoc queries, invalid inside rules (promtool:
    "invalid expression type in recording rule")."""
    _walk(node, allow_range=top_matrix)


def validate_src(src: str, top_matrix: bool = False):
    """Parse + validate; returns the AST (promtool check semantics)."""
    node = parse(src)
    validate(node, top_matrix=top_matrix)
    return node


def _walk(node, allow_range: bool) -> None:
    if isinstance(node, (NumberLiteral, StringLiteral, VectorSelector)):
        return
    if isinstance(node, RangeSelector):
        if not allow_range:
            raise ValueError("range selector outside a function call")
        return
    if isinstance(node, Subquery):
        if not allow_range:
            raise ValueError("subquery outside a function call")
        _walk(node.expr, allow_range=False)
        return
    if isinstance(node, Unary):
        _walk(node.expr, allow_range=False)
        return
    if isinstance(node, Call):
        _check_call(node)
        return
    if isinstance(node, Aggregation):
        if node.op not in _AGG_OPS:
            raise ValueError(f"unknown aggregation operator: {node.op}")
        if node.op in _PARAM_AGGS and node.param is None:
            raise ValueError(f"{node.op} requires a parameter")
        if node.param is not None:
            _walk(node.param, allow_range=False)
        _walk(node.expr, allow_range=False)
        return
    if isinstance(node, BinaryOp):
        if node.op in _SET_OPS:
            if node.bool_mode or node.card != "one_to_one":
                raise ValueError(
                    f"set operator {node.op} takes no group_left/group_right/bool"
                )
            if _is_scalar_literal(node.lhs) or _is_scalar_literal(node.rhs):
                raise ValueError(f"set operator {node.op} requires vectors")
        if node.bool_mode and node.op not in _CMP_OPS:
            raise ValueError("bool modifier is only valid on comparisons")
        if (
            node.op in _CMP_OPS
            and not node.bool_mode
            and _is_scalar_literal(node.lhs)
            and _is_scalar_literal(node.rhs)
        ):
            raise ValueError("comparisons between scalars must use bool modifier")
        _walk(node.lhs, allow_range=False)
        _walk(node.rhs, allow_range=False)
        return
    raise ValueError(f"cannot validate {type(node).__name__}")


def _check_call(node: Call) -> None:
    known = _known_functions()
    if node.func not in known:
        raise ValueError(f"unknown function: {node.func}")
    lo, hi = known[node.func]
    n = len(node.args)
    if n < lo or (hi is not None and n > hi):
        raise ValueError(
            f"{node.func} expects "
            + (f"{lo}" if hi == lo else f"{lo}..{hi if hi is not None else 'n'}")
            + f" argument(s), got {n}"
        )
    rng_idx = _range_arg().get(node.func)
    if rng_idx is not None and rng_idx < n:
        # range functions: the designated argument must BE a range
        arg = node.args[rng_idx]
        if not isinstance(arg, (RangeSelector, Subquery)):
            raise ValueError(
                f"{node.func} expects a range selector or subquery "
                f"(argument {rng_idx + 1})"
            )
    for i, arg in enumerate(node.args):
        _walk(arg, allow_range=i == rng_idx)
    # literal-typed parameters the engine reads with .value
    if node.func == "quantile_over_time" and not isinstance(
        node.args[0], NumberLiteral
    ):
        raise ValueError("quantile_over_time needs a literal quantile")
    if node.func in ("holt_winters", "double_exponential_smoothing") and not all(
        isinstance(a, NumberLiteral) for a in node.args[1:]
    ):
        raise ValueError(f"{node.func} needs literal sf, tf")
    if node.func in ("clamp", "clamp_min", "clamp_max", "round"):
        if not all(_is_scalar_literal(a) for a in node.args[1:]):
            raise ValueError(f"{node.func} bounds must be scalar literals")
