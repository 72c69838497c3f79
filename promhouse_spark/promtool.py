"""promtool-compatible CLI twin (the rule-focused subset)::

    python -m promhouse_spark.promtool check rules rules.yml [...]
    python -m promhouse_spark.promtool test rules tests.yml [...]

``check rules`` validates rule files through the parser + static compile
checks (promql/check.py) — no SparkSession needed. ``test rules`` runs
promtool-style unit test files (promql/unittest.py) against the Spark
PromQL engine. Exit code 0 on success, 1 on any failure, matching
promtool.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Sequence


def _load_doc(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        import yaml

        try:
            doc = yaml.safe_load(text)
        except yaml.YAMLError as e:
            raise ValueError(f"invalid YAML: {e}") from e
    if not isinstance(doc, dict):
        raise ValueError(
            f"expected a mapping at the top level, got {type(doc).__name__}"
        )
    return doc


def check_rules(paths: Sequence[str]) -> int:
    from promhouse_spark.server import load_rule_groups

    rc = 0
    for path in paths:
        try:
            groups = load_rule_groups(path)
        except (OSError, ValueError) as e:
            print(f"  FAILED: {path}: {e}")
            rc = 1
            continue
        n = sum(len(g["rules"]) for g in groups)
        print(f"  SUCCESS: {path}: {len(groups)} group(s), {n} rule(s)")
    return rc


def test_rules(paths: Sequence[str]) -> int:
    from promhouse_spark.promql.unittest import run_rule_tests
    from promhouse_spark.session import get_spark

    spark = get_spark(app_name="promtool-test")
    rc = 0
    for path in paths:
        try:
            doc = _load_doc(path)
            failures = run_rule_tests(
                spark, doc, base_dir=os.path.dirname(os.path.abspath(path))
            )
        except (OSError, ValueError) as e:
            print(f"  FAILED: {path}: {e}")
            rc = 1
            continue
        if failures:
            rc = 1
            print(f"  FAILED: {path}")
            for f in failures:
                print(f"    {f}")
        else:
            print(f"  SUCCESS: {path}")
    return rc


def main(argv: Sequence[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    if len(args) >= 3 and args[0] == "check" and args[1] == "rules":
        return check_rules(args[2:])
    if len(args) >= 3 and args[0] == "test" and args[1] == "rules":
        return test_rules(args[2:])
    print(
        "usage: python -m promhouse_spark.promtool "
        "{check rules|test rules} <file> [...]",
        file=sys.stderr,
    )
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
