"""Raw-SQL passthrough (O7/X8) — resurrection of the reference's dead
ByRawSQL test (``storages/storages_test.go:358-388``, whose backend-name
guard never matched) plus shaping-rule checks (rawsql.go:25-93)."""

import pytest

from promhouse_spark.models import Query, make_matchers
from promhouse_spark.plans.rawsql import is_rawsql, rawsql_text
from promhouse_spark.storage.parquet import SparkParquetStorage
from tests.fixtures import T0, get_data


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    st = SparkParquetStorage(spark, str(tmp_path_factory.mktemp("rawsql_store")))
    st.write(get_data())
    return st


def rq(sql, end_ms=T0):
    return Query(0, end_ms, make_matchers(("job", "=", "rawsql"), ("query", "=", sql)))


def test_trigger_detection():
    q = rq("SELECT 1")
    assert is_rawsql([q])
    assert rawsql_text([q]) == "SELECT 1"
    # not rawsql: wrong job, extra matcher, >1 query, non-EQ type
    assert not is_rawsql([Query(0, 1, make_matchers(("job", "=", "other"), ("query", "=", "x")))])
    assert not is_rawsql([q, q])
    assert not is_rawsql(
        [Query(0, 1, make_matchers(("job", "=", "rawsql"), ("query", "=~", "x")))]
    )


def test_empty_query_falls_through_to_matcher_read(store):
    """{job="rawsql", query=""} is NOT a raw-SQL request (the reference
    requires query != "" — ADVICE r1): it must take the normal matcher path
    instead of feeding spark.sql("") an unparseable statement."""
    q = rq("")
    assert not is_rawsql([q])
    assert rawsql_text([q]) is None
    # matcher read: no stored series has job="rawsql" → empty result, no 500
    assert store.read([q]) == [[]]


def test_by_rawsql_all_samples(store):
    """The reference's dead test: SELECT * over samples → one series per
    row, 15 rows for the golden fixture."""
    res = store.read([rq("SELECT * FROM samples ORDER BY fingerprint, timestamp_ms")])
    assert len(res) == 1
    series = res[0]
    assert len(series) == 15
    # every sample's timestamp is the query End, value from the value column
    assert all(s.samples[0].timestamp_ms == T0 for s in series)
    values = sorted(s.samples[0].value for s in series)
    assert values[:3] == [9.0, 9.0, 9.0] and values[-1] == 595.0
    # non-value columns became labels
    names = {l.name for l in series[0].labels}
    assert names == {"fingerprint", "timestamp_ms"}


def test_rawsql_aggregate_shape(store):
    res = store.read(
        [rq("SELECT count(*) AS n, avg(value) AS value FROM samples", end_ms=12345)]
    )
    (series,) = res[0:1][0]
    assert series.labels_map()["n"] == "15"
    assert series.samples[0].timestamp_ms == 12345
    assert abs(series.samples[0].value - (sum([13, 14, 14, 14, 15, 9, 9, 9, 11, 11, 591, 592, 593, 594, 595]) / 15.0)) < 1e-9


def test_rawsql_no_value_column(store):
    res = store.read([rq("SELECT 'x' AS a")])
    ts = res[0][0]
    assert ts.samples[0].value == 0.0  # absent value column → 0.0
    assert ts.labels_map() == {"a": "x"}


# ------------------------------------------ time-window extraction
# extract_time_window is a PRUNING hint for the chunked tier: it may only
# return bounds that provably constrain the one samples scan (top-level AND
# conjuncts of that block's WHERE); anything ambiguous must be (None, None).


@pytest.mark.parametrize(
    "sql,want",
    [
        ("SELECT * FROM samples WHERE timestamp_ms >= 100 AND timestamp_ms <= 200",
         (100, 200)),
        ("SELECT * FROM samples WHERE timestamp_ms BETWEEN 100 AND 200", (100, 200)),
        ("SELECT * FROM samples s WHERE s.timestamp_ms > 99 AND s.timestamp_ms < 201 "
         "AND value > 0", (100, 200)),
        ("SELECT * FROM samples WHERE 100 <= timestamp_ms AND 200 >= timestamp_ms",
         (100, 200)),
        ("SELECT * FROM samples WHERE timestamp_ms = 150", (150, 150)),
        ("SELECT fingerprint, count(*) AS value FROM samples "
         "WHERE timestamp_ms >= 100 GROUP BY fingerprint", (100, None)),
        ("SELECT * FROM samples s JOIN time_series t ON s.fingerprint = t.fingerprint "
         "WHERE s.timestamp_ms >= 100 AND t.fingerprint > 0", (100, None)),
        ("SELECT x FROM (SELECT * FROM samples WHERE timestamp_ms BETWEEN 10 AND 20) "
         "GROUP BY x", (10, 20)),
        ("SELECT * FROM samples_physical WHERE timestamp_ms < 201 AND timestamp_ms > 99",
         (100, 200)),
        ("SELECT * FROM samples WHERE fingerprint IN "
         "(SELECT f FROM x WHERE timestamp_ms > 5) AND timestamp_ms <= 200",
         (None, 200)),
        # must NOT prune:
        ("SELECT * FROM samples WHERE timestamp_ms >= 100 OR value = 1", (None, None)),
        ("SELECT * FROM samples WHERE NOT timestamp_ms >= 100", (None, None)),
        ("SELECT * FROM samples WHERE (timestamp_ms >= 100 OR value = 1) AND value > 2",
         (None, None)),
        ("SELECT count(*) FROM samples", (None, None)),
        ("SELECT * FROM samples WHERE timestamp_ms >= 100 "
         "UNION ALL SELECT * FROM samples", (None, None)),
        # the outer WHERE filters an AGGREGATE aliased timestamp_ms — using
        # it to prune the scan would change min()-style results
        ("SELECT * FROM (SELECT fingerprint, max(timestamp_ms) AS timestamp_ms "
         "FROM samples GROUP BY fingerprint) WHERE timestamp_ms >= 100", (None, None)),
        # another table's timestamp_ms column
        ("SELECT * FROM samples s JOIN other o ON s.fingerprint = o.f "
         "WHERE o.timestamp_ms >= 100", (None, None)),
        ("SELECT * FROM samples WHERE label = 'AND timestamp_ms >= 5'", (None, None)),
        ("SELECT * FROM time_series WHERE job = '1'", (None, None)),
        # comments are NOT live predicates (the commented bound must not
        # narrow; the live one still prunes)
        ("SELECT * FROM samples WHERE timestamp_ms >= 100 -- AND timestamp_ms <= 50",
         (100, None)),
        ("SELECT * FROM samples WHERE timestamp_ms >= 100 /* AND timestamp_ms <= 50 */",
         (100, None)),
        ("SELECT * FROM samples WHERE /* a /* nested */ b */ timestamp_ms >= 7",
         (7, None)),
        ("SELECT * FROM samples -- comment with a quote: don't\nWHERE timestamp_ms >= 3",
         (3, None)),
        # backslash in a string literal: quote handling can't be proven to
        # match Spark's parser — give up on pruning entirely
        ("SELECT * FROM samples WHERE label = 'x\\' AND timestamp_ms <= 5 AND y = ''",
         (None, None)),
        # double-quoted literals hide keywords the same way single quotes do
        ('SELECT * FROM samples WHERE label = "x AND timestamp_ms <= 5"',
         (None, None)),
        # unterminated comment / literal: bail, never guess
        ("SELECT * FROM samples WHERE timestamp_ms <= 5 /* oops", (None, None)),
        ("SELECT * FROM samples WHERE timestamp_ms <= 5 AND label = 'oops",
         (None, None)),
        # backticked identifier is not provably the samples column
        ("SELECT * FROM samples WHERE `timestamp_ms` <= 5", (None, None)),
    ],
)
def test_extract_time_window(sql, want):
    from promhouse_spark.plans.rawsql import extract_time_window

    assert extract_time_window(sql) == want
