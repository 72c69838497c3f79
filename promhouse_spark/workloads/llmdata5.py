"""LLM-data-pipeline workloads, fifth wave (round 10): DSIR importance
resampling (Xie et al. 2023) — select raw documents that look like a
target corpus by hashed-n-gram log-likelihood ratio, resampled with
deterministic Gumbel noise (operators/dsir.py).

The oracle replays the whole pipeline in DuckDB: same polynomial feature
hash, same add-one smoothing, same Knuth-hash uniform → Gumbel transform,
so the per-document weight, noise, and keep verdict all hash-compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from promhouse_spark.session import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_K = 64  # feature buckets (tiny for oracle-exactness; shape is what scales)


def doc_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection over the documents corpus: target = the English
    subset, raw = everything; output the importance weight, Gumbel noise,
    and keep verdict per document. Plan: two 64-row feature histograms
    (keyed agg, broadcast back), one explode + per-doc agg — no global
    sort, no corpus-sized join."""
    from promhouse_spark.operators.dsir import (
        bucket_log_ratios,
        dsir_weights,
        gumbel_keep,
    )

    docs = load_table(spark, sf_dir, "documents")
    lr = bucket_log_ratios(docs.filter(F.col("lang") == "en"), docs, n_buckets=_K)
    w = dsir_weights(docs, lr, n_buckets=_K)
    return gumbel_keep(w).orderBy("doc_id")


DOC_DSIR_SELECT_SQL = rf"""
WITH feats AS (
  SELECT doc_id, lang,
         (ascii(substr(f, 1, 1)) * 31 + ascii(substr(f, 2, 1)) * 7
          + length(f)) % {_K} AS bucket
  FROM (
    SELECT doc_id, lang, unnest(list_concat(words,
             list_transform(range(len(words) - 1),
                            i -> words[i + 1] || ' ' || words[i + 2]))) AS f
    FROM (
      SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\s+'),
                         x -> length(x) > 0) AS words
      FROM documents
    )
  )
),
domain AS (SELECT unnest(range({_K})) AS bucket),
t AS (SELECT bucket, count(*) AS t_cnt FROM feats WHERE lang = 'en'
      GROUP BY bucket),
r AS (SELECT bucket, count(*) AS r_cnt FROM feats GROUP BY bucket),
lr AS (
  SELECT d.bucket,
         ln((coalesce(t_cnt, 0) + 1)
            / ((SELECT sum(t_cnt) FROM t) + {_K}))
         - ln((coalesce(r_cnt, 0) + 1)
              / ((SELECT sum(r_cnt) FROM r) + {_K})) AS log_ratio
  FROM domain d LEFT JOIN t ON d.bucket = t.bucket
               LEFT JOIN r ON d.bucket = r.bucket
),
per_doc AS (
  SELECT doc_id, bucket, count(*) AS cnt FROM feats GROUP BY doc_id, bucket
),
w AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats,
         sum(cnt * log_ratio) AS weight
  FROM per_doc JOIN lr USING (bucket) GROUP BY doc_id
)
SELECT doc_id, n_feats, round(weight, 6) AS weight,
       round(-ln(-ln(((doc_id * 2654435761) % 1048576 + 0.5) / 1048576.0)),
             6) AS gumbel,
       (weight + (-ln(-ln(((doc_id * 2654435761) % 1048576 + 0.5)
                          / 1048576.0)))) > 0.0 AS keep
FROM w
ORDER BY doc_id
"""


QUERIES["doc_dsir_select"] = doc_dsir_select
ORACLES["doc_dsir_select"] = DOC_DSIR_SELECT_SQL
