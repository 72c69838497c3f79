"""The reference README's three documented analytics queries (README.md:74-119)
run through the raw-SQL escape hatch over the engine's own two-table model —
the Phase-3 'named tests' of SURVEY §7, plus a Spark-vs-Python differential
for the canonical label JSON."""

import json
import os
import zlib

import pytest


def _stable_hash(job: str, i: int, m: str) -> int:
    # NOT builtin hash(): that is randomized per interpreter (PYTHONHASHSEED),
    # which made the absolute-count assertions flake across runs
    return zlib.crc32(f"{job}/{i}/{m}".encode())

from promhouse_spark.functions.labels import labels_map_to_json, marshal_labels
from promhouse_spark.plans.rawsql import translate_clickhouse_sql
from promhouse_spark.models import Label, Query, Sample, TimeSeries, make_matchers
from promhouse_spark.storage.parquet import SparkParquetStorage
from tests.fixtures import T0


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    st = SparkParquetStorage(spark, str(tmp_path_factory.mktemp("readme_store")))
    series = []
    for job, inst_count, metrics in [
        ("node", 3, ("up", "cpu", "mem")),
        ("api", 2, ("up", "requests")),
        ("db", 1, ("up",)),
    ]:
        for i in range(inst_count):
            for m in metrics:
                series.append(
                    TimeSeries(
                        labels=[
                            Label("__name__", m),
                            Label("instance", f"{job}-{i}"),
                            Label("job", job),
                        ],
                        # sample count varies per series so top-k is meaningful
                        samples=[
                            Sample(1.0, T0 + k * 1000)
                            for k in range(1 + (_stable_hash(job, i, m) % 5))
                        ],
                    )
                )
    st.write(series)
    st.register_views()
    return st


def rawsql(store, sql, end_ms=T0):
    (res,) = store.read(
        [Query(0, end_ms, make_matchers(("job", "=", "rawsql"), ("query", "=", sql)))]
    )
    return res


def test_readme_top_jobs_by_series_count(store):
    """README.md:79-88: biggest jobs/instances by series count — the
    visitParamExtractString query via get_json_object over labels_json."""
    res = rawsql(
        store,
        """
        SELECT get_json_object(labels_json, '$.job') AS job,
               get_json_object(labels_json, '$.instance') AS instance,
               count(*) AS value
        FROM time_series_json
        GROUP BY 1, 2 ORDER BY value DESC, job, instance LIMIT 10
        """,
    )
    top = res[0].labels_map()
    assert top["job"] == "node"  # 3 instances × 3 metrics dominate
    assert res[0].samples[0].value == 3.0  # 3 series per node instance
    assert len(res) == 6  # 3+2+1 instances


def test_readme_metric_cardinality(store):
    """README.md:92-100: series count per metric name, top-10."""
    res = rawsql(
        store,
        """
        SELECT labels['__name__'] AS name, count(*) AS value
        FROM time_series GROUP BY 1 ORDER BY value DESC, name LIMIT 10
        """,
    )
    by_name = {ts.labels_map()["name"]: ts.samples[0].value for ts in res}
    assert by_name["up"] == 6.0  # every instance exports up
    assert by_name["cpu"] == 3.0 and by_name["requests"] == 2.0


def test_readme_largest_series_join(store):
    """README.md:104-119: registry joined to the top-10 series by sample
    count (the ANY INNER JOIN ≡ inner join on the deduped top-k set)."""
    res = rawsql(
        store,
        """
        SELECT t.labels['job'] AS job, t.labels['instance'] AS instance,
               t.labels['__name__'] AS name, s.cnt AS value
        FROM time_series t
        JOIN (SELECT fingerprint, count(*) AS cnt FROM samples
              GROUP BY fingerprint ORDER BY cnt DESC LIMIT 10) s
          ON t.fingerprint = s.fingerprint
        ORDER BY value DESC, job, instance, name
        """,
    )
    assert len(res) == 10
    counts = [ts.samples[0].value for ts in res]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] == 5.0  # max samples per series in the fixture


def test_spark_json_matches_python_marshaller(spark):
    """labels_map_to_json (Spark) ≡ marshal_labels (python) as parsed maps,
    the same comparison discipline the reference's own tests use."""
    label_sets = [
        {"__name__": "up", "job": "a"},
        {"b": "2", "a": "1", "c": "3"},
        {"quotes": '"\\', "newline": "a\nb", "tab": "a\tb"},
        {"🆗": "🆗"},
        {},
    ]
    df = spark.createDataFrame(
        [(i, ls) for i, ls in enumerate(label_sets)], "id long, labels map<string,string>"
    )
    rows = df.select("id", labels_map_to_json("labels").alias("j")).collect()
    for r in rows:
        ls = label_sets[r["id"]]
        assert json.loads(r["j"]) == json.loads(marshal_labels(ls))
        # both sides canonical: keys sorted
        assert list(json.loads(r["j"]).keys()) == sorted(ls.keys())


# ---- the same three queries VERBATIM in ClickHouse dialect (ADVICE r2 /
# VERDICT r2 missing #2): the escape hatch translates visitParamExtractString,
# GROUP BY ... AS alias, and ANY INNER JOIN so the README's documented SQL
# runs unmodified.


def test_readme_verbatim_top_jobs(store):
    """README.md:77-87, character-for-character."""
    res = rawsql(
        store,
        """SELECT
    job,
    instance,
    COUNT(*) AS value
FROM time_series
GROUP BY
    visitParamExtractString(labels, 'job') AS job,
    visitParamExtractString(labels, 'instance') AS instance
ORDER BY value DESC LIMIT 10""",
    )
    assert len(res) == 6
    assert res[0].labels_map()["job"] == "node"
    assert res[0].samples[0].value == 3.0


def test_readme_verbatim_metric_cardinality(store):
    """README.md:91-99, character-for-character."""
    res = rawsql(
        store,
        """SELECT
    name,
    COUNT(*) AS value
FROM time_series
GROUP BY
    visitParamExtractString(labels, '__name__') AS name
ORDER BY value DESC LIMIT 10""",
    )
    assert res[0].labels_map()["name"] == "up"  # every job exports `up`
    assert res[0].samples[0].value == 6.0  # 3+2+1 instances


def test_readme_verbatim_top_series_by_samples(store):
    """README.md:103-119, character-for-character. Labels render as the
    reference's canonical JSON string."""
    res = rawsql(
        store,
        """SELECT
    labels,
    value
FROM time_series
ANY INNER JOIN
(
    SELECT
        fingerprint,
        COUNT(*) AS value
    FROM samples
    GROUP BY fingerprint
    ORDER BY value DESC
    LIMIT 10
) USING (fingerprint)""",
    )
    assert len(res) == 10
    # expected: the top-10 per-series sample counts from the fixture
    # (rebuilt with the same in-process hash the fixture used)
    fixture_counts = sorted(
        (
            float(1 + (_stable_hash(job, i, m) % 5))
            for job, n, metrics in [
                ("node", 3, ("up", "cpu", "mem")),
                ("api", 2, ("up", "requests")),
                ("db", 1, ("up",)),
            ]
            for i in range(n)
            for m in metrics
        ),
        reverse=True,
    )[:10]
    got_counts = sorted((ts.samples[0].value for ts in res), reverse=True)
    assert got_counts == fixture_counts
    # every labels "column" is the canonical JSON object string
    for ts in res:
        parsed = json.loads(ts.labels_map()["labels"])
        assert set(parsed) == {"__name__", "instance", "job"}


# ---- golden translated-SQL fixture (VERDICT r4 #8): the dialect shim's
# input->output pairs live in tests/golden/clickhouse_dialect.txt so any
# behavior change in translate_clickhouse_sql shows up as a reviewable
# fixture diff, not just as downstream test churn.

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "clickhouse_dialect.txt")

GOLDEN_CASES = {
    "readme_top_jobs": """SELECT
    job,
    instance,
    COUNT(*) AS value
FROM time_series
GROUP BY
    visitParamExtractString(labels, 'job') AS job,
    visitParamExtractString(labels, 'instance') AS instance
ORDER BY value DESC LIMIT 10""",
    "readme_metric_cardinality": """SELECT
    name,
    COUNT(*) AS value
FROM time_series
GROUP BY
    visitParamExtractString(labels, '__name__') AS name
ORDER BY value DESC LIMIT 10""",
    "readme_top_series_by_samples": """SELECT
    labels,
    value
FROM time_series
ANY INNER JOIN
(
    SELECT
        fingerprint,
        COUNT(*) AS value
    FROM samples
    GROUP BY fingerprint
    ORDER BY value DESC
    LIMIT 10
) USING (fingerprint)""",
    "any_left_join_lowercase": "SELECT a.x FROM a any left join b USING (k)",
    "bare_any_join": "SELECT * FROM a ANY JOIN b USING (k)",
    "visitparam_spacing": "SELECT visitParamExtractString( labels ,  'job' ) AS j FROM t",
    "visitparam_empty_key": "SELECT visitParamExtractString(labels, '') AS j FROM t",
    "groupby_alias_select_star": (
        "SELECT * FROM t GROUP BY visitParamExtractString(labels, 'job') AS job"
    ),
    "groupby_alias_subquery_scoped": """SELECT k, s FROM (
  SELECT k, SUM(v) AS s FROM inner_t GROUP BY lower(name) AS k
) GROUP BY k, s ORDER BY s""",
    "groupby_alias_subquery_is_last_clause": (
        "SELECT t.k FROM (SELECT k FROM x GROUP BY upper(n) AS k) t"
    ),
    "groupby_mixed_plain_and_aliased": (
        "SELECT region, j, COUNT(*) AS c FROM t "
        "GROUP BY region, element_at(labels, 'job') AS j LIMIT 5"
    ),
    "plain_spark_sql_untouched": """SELECT l_returnflag, SUM(l_quantity) AS sum_qty
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag ORDER BY l_returnflag""",
    "known_caveat_keyword_inside_string_literal": (
        "SELECT 'ANY INNER JOIN' AS s, x FROM t"
    ),
}


def _render_golden() -> str:
    lines = [
        "# Golden ClickHouse->Spark dialect translations.",
        "# Regenerate with: PHS_REGEN_GOLDEN=1 python -m pytest "
        "tests/test_readme_analytics.py -k golden",
        "# Any diff here is a dialect-shim behavior change; review it as such.",
        "",
    ]
    for name, sql in GOLDEN_CASES.items():
        lines += [
            f"==== {name} ====",
            "---- input ----",
            sql,
            "---- translated ----",
            translate_clickhouse_sql(sql),
            "",
        ]
    return "\n".join(lines)


def test_clickhouse_dialect_golden():
    rendered = _render_golden()
    if os.environ.get("PHS_REGEN_GOLDEN"):
        with open(GOLDEN, "w") as f:
            f.write(rendered)
    with open(GOLDEN) as f:
        assert f.read() == rendered, (
            "dialect shim output drifted from tests/golden/clickhouse_dialect.txt; "
            "if intentional, regenerate with PHS_REGEN_GOLDEN=1 and review the diff"
        )


def test_subquery_final_groupby_hoist_executes(spark):
    """The golden case that exposed the clause-end paren bug must not just
    translate — Spark must accept and evaluate the translated SQL."""
    spark.createDataFrame(
        [("Ab", 1), ("aB", 2), ("c", 3)], "n string, v long"
    ).createOrReplaceTempView("x")
    out = spark.sql(
        translate_clickhouse_sql(
            "SELECT t.k, t.sv FROM (SELECT k, SUM(v) AS sv FROM x "
            "GROUP BY upper(n) AS k) t ORDER BY k"
        )
    ).collect()
    assert [(r["k"], r["sv"]) for r in out] == [("AB", 3), ("C", 3)]
