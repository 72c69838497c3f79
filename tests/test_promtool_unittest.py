"""promtool-style rules unit testing (promql/unittest.py + promtool.py):
the Prometheus docs' InstanceDown example plus expr tests, run against
the Spark engine; value-notation expansion pins."""

from __future__ import annotations

import math
import textwrap

import pytest

from promhouse_spark.promql.unittest import parse_series_values, run_rule_tests

# slow tier (r12): promtool rule-test integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow



def test_value_notation():
    assert parse_series_values("1 2 3") == [1.0, 2.0, 3.0]
    assert parse_series_values("0+10x3") == [0.0, 10.0, 20.0, 30.0]
    assert parse_series_values("10-2x2") == [10.0, 8.0, 6.0]
    assert parse_series_values("5x3") == [5.0, 5.0, 5.0, 5.0]
    assert parse_series_values("-4+2x2") == [-4.0, -2.0, 0.0]
    assert parse_series_values("1 _ 3") == [1.0, None, 3.0]
    assert parse_series_values("1 stale 3") == [1.0, None, 3.0]
    v = parse_series_values("Inf -Inf NaN")
    assert v[0] == math.inf and v[1] == -math.inf and math.isnan(v[2])
    assert parse_series_values("1e2 1.5") == [100.0, 1.5]
    # repetition of the IEEE specials (promtool supports Infx3 etc.)
    assert parse_series_values("Infx2") == [math.inf] * 3
    assert parse_series_values("-Infx1") == [-math.inf] * 2
    assert all(math.isnan(x) for x in parse_series_values("NaNx1"))
    got = parse_series_values("1e-3+2e-4x2")
    assert all(abs(a - b) < 1e-12 for a, b in zip(got, [0.001, 0.0012, 0.0014]))


RULES_YML = textwrap.dedent(
    """
    groups:
      - name: example
        rules:
          - record: job:up:count
            expr: count by (job) (up)
          - alert: InstanceDown
            expr: up == 0
            for: 5m
            labels:
              severity: page
    """
)

TESTS_YML = textwrap.dedent(
    """
    rule_files:
      - rules.yml
    evaluation_interval: 1m
    tests:
      - interval: 1m
        input_series:
          - series: 'up{job="prometheus", instance="localhost:9090"}'
            values: '0 0 0 0 0 0 0 0 0 0 0 0 0 0 0'
          - series: 'up{job="node_exporter", instance="localhost:9100"}'
            values: '1+0x14'
        promql_expr_test:
          - expr: count(up)
            eval_time: 5m
            exp_samples:
              - labels: '{}'
                value: 2
          - expr: up
            eval_time: 5m
            exp_samples:
              - labels: 'up{job="prometheus", instance="localhost:9090"}'
                value: 0
              - labels: 'up{job="node_exporter", instance="localhost:9100"}'
                value: 1
        alert_rule_test:
          - eval_time: 10m
            alertname: InstanceDown
            exp_alerts:
              - exp_labels:
                  severity: page
                  job: prometheus
                  instance: localhost:9090
          - eval_time: 3m
            alertname: InstanceDown
            exp_alerts: []
    """
)


@pytest.fixture(scope="module")
def test_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("promtool")
    (d / "rules.yml").write_text(RULES_YML)
    (d / "tests.yml").write_text(TESTS_YML)
    return d


def test_docs_example_passes(spark, test_dir):
    import yaml

    doc = yaml.safe_load(TESTS_YML)
    failures = run_rule_tests(spark, doc, base_dir=str(test_dir))
    assert failures == []


def test_failures_are_reported(spark, test_dir):
    import yaml

    doc = yaml.safe_load(TESTS_YML)
    # break an expectation: count(up) is 2, claim 3
    doc["tests"][0]["promql_expr_test"][0]["exp_samples"][0]["value"] = 3
    failures = run_rule_tests(spark, doc, base_dir=str(test_dir))
    assert len(failures) == 1 and "count(up)" in failures[0]
    # expect an alert that is NOT firing yet at 3m (for: 5m)
    doc = yaml.safe_load(TESTS_YML)
    doc["tests"][0]["alert_rule_test"][1]["exp_alerts"] = [
        {"exp_labels": {"severity": "page", "job": "prometheus",
                        "instance": "localhost:9090"}}
    ]
    failures = run_rule_tests(spark, doc, base_dir=str(test_dir))
    assert len(failures) == 1 and "InstanceDown" in failures[0]


def test_cli_check_rules(test_dir, capsys):
    from promhouse_spark.promtool import main

    assert main(["check", "rules", str(test_dir / "rules.yml")]) == 0
    out = capsys.readouterr().out
    assert "SUCCESS" in out and "2 rule(s)" in out
    bad = test_dir / "bad.yml"
    bad.write_text("groups:\n- name: g\n  rules:\n  - record: r\n    expr: rate(m)\n")
    assert main(["check", "rules", str(bad)]) == 1
    assert main(["bogus"]) == 2


def test_exp_annotations(spark, tmp_path):
    import yaml

    (tmp_path / "rules.yml").write_text(textwrap.dedent(
        """
        groups:
          - name: g
            rules:
              - alert: Down
                expr: up == 0
                annotations:
                  summary: instance down
        """
    ))
    doc = yaml.safe_load(textwrap.dedent(
        """
        rule_files: [rules.yml]
        tests:
          - interval: 1m
            input_series:
              - series: 'up{job="p"}'
                values: '0 0 0'
            alert_rule_test:
              - eval_time: 2m
                alertname: Down
                exp_alerts:
                  - exp_labels: {job: p}
                    exp_annotations: {summary: instance down}
        """
    ))
    assert run_rule_tests(spark, doc, base_dir=str(tmp_path)) == []
    doc["tests"][0]["alert_rule_test"][0]["exp_alerts"][0][
        "exp_annotations"
    ] = {"summary": "WRONG"}
    failures = run_rule_tests(spark, doc, base_dir=str(tmp_path))
    assert len(failures) == 1 and "annotations" in failures[0]


def test_unaligned_eval_time_and_int_labels(spark, tmp_path):
    """eval_time not a multiple of the interval still reports the firing
    state of the last aligned evaluation; int-valued YAML rule labels
    compare as strings (the Prometheus label model)."""
    import yaml

    (tmp_path / "rules.yml").write_text(textwrap.dedent(
        """
        groups:
          - name: g
            rules:
              - alert: Down
                expr: up == 0
                for: 5m
                labels:
                  priority: 1
        """
    ))
    doc = yaml.safe_load(textwrap.dedent(
        """
        rule_files: [rules.yml]
        tests:
          - interval: 1m
            input_series:
              - series: 'up{job="p"}'
                values: '0x14'
            alert_rule_test:
              - eval_time: 10m30s
                alertname: Down
                exp_alerts:
                  - exp_labels: {job: p, priority: 1}
        """
    ))
    assert run_rule_tests(spark, doc, base_dir=str(tmp_path)) == []


def test_malformed_files_report_failed(tmp_path, capsys):
    from promhouse_spark.promtool import main

    bad = tmp_path / "broken.yml"
    bad.write_text("a: [unclosed")
    assert main(["test", "rules", str(bad)]) == 1
    assert "FAILED" in capsys.readouterr().out
    scalar = tmp_path / "scalar.yml"
    scalar.write_text("'just a string'")
    assert main(["check", "rules", str(scalar)]) == 1
    assert "FAILED" in capsys.readouterr().out


def test_annotation_template_expansion(spark, tmp_path):
    """{{ $labels.x }} / {{ $value }} expand against each firing alert."""
    import yaml

    (tmp_path / "rules.yml").write_text(textwrap.dedent(
        """
        groups:
          - name: g
            rules:
              - alert: High
                expr: m > 5
                annotations:
                  summary: "{{ $labels.job }} is at {{ $value }}"
                  runbook: "see wiki"
        """
    ))
    doc = yaml.safe_load(textwrap.dedent(
        """
        rule_files: [rules.yml]
        tests:
          - interval: 1m
            input_series:
              - series: 'm{job="api"}'
                values: '7 7 7'
            alert_rule_test:
              - eval_time: 2m
                alertname: High
                exp_alerts:
                  - exp_labels: {job: api}
                    exp_annotations:
                      summary: "api is at 7"
                      runbook: "see wiki"
        """
    ))
    assert run_rule_tests(spark, doc, base_dir=str(tmp_path)) == []
    doc["tests"][0]["alert_rule_test"][0]["exp_alerts"][0][
        "exp_annotations"
    ]["summary"] = "api is at 8"
    failures = run_rule_tests(spark, doc, base_dir=str(tmp_path))
    assert len(failures) == 1 and "annotations" in failures[0]


def test_template_value_renders_go_g():
    """$value renders like Go %v (strconv 'g', shortest, eprec=21): fixed
    notation through the 1e16..1e21 zone where Python repr already went
    scientific, scientific outside -4 <= exp < 21."""
    from promhouse_spark.promql.templates import format_template_value as f

    assert f(1e16) == "10000000000000000"
    assert f(1.5e18) == "1500000000000000000"
    assert f(1e20) == "100000000000000000000"
    assert f(1e21) == "1e+21"
    assert f(1.2345678901234568e21) == "1.2345678901234568e+21"
    assert f(1e-5) == "1e-05"
    assert f(0.0001) == "0.0001"
    assert f(-2.5e17) == "-250000000000000000"
    assert f(5.0) == "5"
    assert f(42.5) == "42.5"
    assert f(float("inf")) == "+Inf"
    assert f(float("-inf")) == "-Inf"
    assert f(float("nan")) == "NaN"
    assert f(0.0) == "0"
    assert f(-0.0) == "-0"


def test_native_histogram_literals():
    from promhouse_spark.models import NativeHistogram
    from promhouse_spark.promql.unittest import parse_series_values

    vals = parse_series_values(
        "{{schema:0 sum:10 count:6 z_bucket:1 z_bucket_w:0.25 "
        "buckets:[2 3] offset:1}}x2 _ 5"
    )
    assert len(vals) == 5
    assert all(isinstance(h, NativeHistogram) for h in vals[:3])
    h = vals[0]
    assert h.schema == 0 and h.count == 6.0 and h.sum == 10.0
    assert h.zero_count == 1.0 and h.zero_threshold == 0.25
    assert h.positive == [(1, 2.0), (2, 3.0)]
    assert vals[3] is None and vals[4] == 5.0


def test_rule_tests_with_native_histograms(spark):
    from promhouse_spark.promql.unittest import run_rule_tests

    doc = {
        "tests": [
            {
                "interval": "1m",
                "input_series": [
                    {
                        "series": 'lat{job="api"}',
                        "values": (
                            "{{schema:0 sum:10 count:6 z_bucket:1 "
                            "z_bucket_w:0.25 buckets:[2 3] offset:1}}x5"
                        ),
                    }
                ],
                "promql_expr_test": [
                    {
                        "expr": "histogram_count(lat)",
                        "eval_time": "2m",
                        "exp_samples": [
                            {"labels": '{job="api"}', "value": 6.0}
                        ],
                    },
                    {
                        "expr": "histogram_quantile(0.5, lat)",
                        "eval_time": "2m",
                        "exp_samples": [
                            {"labels": '{job="api"}', "value": 2.0}
                        ],
                    },
                ],
            }
        ]
    }
    assert run_rule_tests(spark, doc) == []
    # a wrong expectation is reported, not swallowed
    doc["tests"][0]["promql_expr_test"][0]["exp_samples"][0]["value"] = 7.0
    assert run_rule_tests(spark, doc) != []
