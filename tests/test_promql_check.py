"""Static PromQL validation (promhouse_spark/promql/check.py) — the
promtool-check workflow: structural errors fail at rule LOAD, without a
SparkSession."""

from __future__ import annotations

import pytest

from promhouse_spark.promql.check import validate_src


GOOD = [
    "rate(m[5m])",
    "sum by (job) (rate(requests_total[2m]))",
    "clamp(m, -1, 1)",
    "round(m, 0.5)",
    "quantile_over_time(0.9, m[5m])",
    "holt_winters(m[10m], 0.1, 0.3)",
    "predict_linear(m[10m], 600)",
    "histogram_quantile(0.9, rate(b_bucket[5m]))",
    "label_replace(m, \"dst\", \"$1\", \"src\", \"(.*)\")",
    "topk(3, m)",
    "m / on(job) group_left n",
    "avg_over_time(max_over_time(m[5m])[30m:5m])",
    "absent_over_time(m[5m])",
    "pi() > bool 2",
    "vector(1)",
    "timestamp(m)",
]

BAD = [
    "rate(m)",                      # missing range
    "clamp(m)",                     # arity
    "clamp(m, n, 1)",               # non-literal bound
    "no_such_function(m)",          # unknown function
    "rate(m[5m], 2)",               # arity
    "quantile_over_time(m[5m])",    # arity
    "quantile_over_time(m, m[5m])", # non-literal quantile
    "holt_winters(m[5m], n, 0.3)",  # non-literal sf
    "topk(m)",                      # parser: missing param
    "1 and m",                      # set op with scalar
    "m + bool n",                   # bool on non-comparison
    "1 > 2",                        # scalar comparison without bool
    "avg_over_time(m)",             # over_time without range
    "scalar(m, n)",                 # arity
    "pi(m)",                        # arity (0 args)
]


@pytest.mark.parametrize("src", GOOD)
def test_valid_expressions_pass(src):
    validate_src(src)


@pytest.mark.parametrize("src", BAD)
def test_invalid_expressions_fail(src):
    with pytest.raises(ValueError):
        validate_src(src)


def test_load_rule_groups_rejects_uncompilable(tmp_path):
    from promhouse_spark.server import load_rule_groups

    f = tmp_path / "rules.json"
    f.write_text(
        '{"groups": [{"name": "g", "rules": '
        '[{"record": "r", "expr": "rate(m)"}]}]}'
    )
    with pytest.raises(ValueError, match="bad expr"):
        load_rule_groups(str(f))


def test_check_rules_requires_rules_file(capsys):
    from promhouse_spark.server import main

    with pytest.raises(SystemExit):
        main(["--check-rules"])


def test_format_value_go_strconv_shapes():
    # Go strconv.FormatFloat(v, 'f', -1, 64) never uses scientific
    # notation and prints the SHORTEST round-trip digits in fixed form
    from promhouse_spark.edge.http import _format_value as fmt

    assert fmt(0.00001) == "0.00001"
    assert fmt(1e17) == "100000000000000000"
    assert fmt(1e300) == "1" + "0" * 300
    assert fmt(-0.0) == "-0"
    assert fmt(0.0) == "0"
    assert fmt(1.5) == "1.5"
    assert fmt(5.0) == "5"
    assert fmt(float("inf")) == "+Inf"
    assert fmt(float("-inf")) == "-Inf"
    assert fmt(float("nan")) == "NaN"
