"""promhouse_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Percona-Lab/PromHouse (Prometheus remote
storage on a columnar store), re-expressed Spark-first.

Layout:
  - ``schemas``    — persistent two-table data model (time_series, samples)
  - ``models``     — wire/logical dataclasses (Label, Sample, TimeSeries,
                     Matcher, Query) mirroring ``storages/base/base.go``
  - ``functions``  — scalar kernels (FNV-1a fingerprint, label JSON codec)
  - ``operators``  — matcher compiler, series grouping, downsampling, and the
                     beyond-reference LLM-data-pipeline operators (dedup,
                     similarity search, text analysis, multimodal)
  - ``storage``    — Storage backends: in-memory oracle + Spark/Parquet engine
  - ``plans``      — read/write query pipelines (DataFrame compositions)
  - ``streaming``  — Structured Streaming ingestion
  - ``edge``       — protocol edge: exposition parser, framed files, HTTP

Everything here derives from public knowledge only: the Apache Spark API and
the reference's observable behavior (cited as ``file:line`` into
``/root/reference``).
"""

__version__ = "0.1.0"

from promhouse_spark.models import (  # noqa: F401
    Label,
    MatchType,
    Matcher,
    Query,
    Sample,
    TimeSeries,
)
