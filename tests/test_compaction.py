"""Compaction (MergeTree background-merge equivalent) and consolidated
ingest: many micro-batch files → few clustered files, same query results."""

import glob

from promhouse_spark.models import Query, make_matchers
from promhouse_spark.storage.parquet import SparkParquetStorage
from tests.fixtures import T0, get_data, normalize


def test_compact_preserves_results_and_reduces_files(spark, tmp_path):
    st = SparkParquetStorage(spark, str(tmp_path / "store"))
    data = get_data()
    for ts in data:  # one write per series → many small files
        st.write([ts])
    q = Query(T0 - 60_000, T0 + 60_000, make_matchers(("__name__", "=", "http_requests_total")))
    before = normalize(st.read([q])[0])
    files_before = len(glob.glob(f"{st.samples_path}/**/*.parquet", recursive=True))

    st.compact_samples(files_per_day=1)

    files_after = len(glob.glob(f"{st.samples_path}/**/*.parquet", recursive=True))
    assert files_after < files_before
    assert normalize(st.read([q])[0]) == before


def test_ingest_files_per_day(spark, tmp_path):
    st = SparkParquetStorage(spark, str(tmp_path / "store2"))
    rows = [(1, T0 + i * 1000, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "fingerprint long, timestamp_ms long, value double")
    st.ingest_df(df, files_per_day=1)
    files = glob.glob(f"{st.samples_path}/**/*.parquet", recursive=True)
    assert len(files) == 1  # single day, consolidated


def test_hadoop_fs_ops_route_by_scheme(spark, tmp_path):
    """storage.fs goes through org.apache.hadoop.fs.FileSystem: the path
    scheme picks the implementation, so the same exists/rename/delete used
    by compaction work on file://, hdfs://, s3a:// alike."""
    from promhouse_spark.storage import fs

    src = f"file://{tmp_path}/a"
    dst = f"file://{tmp_path}/b"
    assert not fs.exists(spark, src)
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x").write_text("1")
    assert fs.exists(spark, src)
    fs.rename(spark, src, dst)
    assert not fs.exists(spark, src) and fs.exists(spark, dst)
    assert fs.delete(spark, dst)
    assert not fs.exists(spark, dst)
    assert fs.delete(spark, dst) is False  # idempotent on missing paths
