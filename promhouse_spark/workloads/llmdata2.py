"""Third-wave LLM-data-pipeline workloads: duplicate-cluster resolution
(connected components over the near-dup pair graph), exact length quantiles,
deterministic train/val/test splitting, and per-label embedding centroid
analytics. Each pairs a Spark-native implementation with a DuckDB oracle
that reaches the same answer by a different algorithm (recursive CTE vs
iterative propagation, correlated quantiles vs keyed percentile, the same
arithmetic hash, parallel-unnest vs higher-order array folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from promhouse_spark.operators import dedup as D
from promhouse_spark.operators import sampling as SP
from promhouse_spark.session import load_table


def doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: exact-Jaccard ≥ 0.8 pairs (source-
    blocked, same edges as ``doc_jaccard_pairs``) fed through distributed
    min-label propagation (operators/dedup.py:connected_components). One
    row per cluster: its id (= min doc_id = the keeper a dedup pipeline
    retains), member count, and max member. The oracle computes the same
    components by recursive-CTE transitive closure — a genuinely different
    algorithm reaching the same fixpoint."""
    docs = load_table(spark, sf_dir, "documents")
    edges = D.ngram_jaccard_pairs(
        docs, group_col="source", threshold=0.8, prefix_filter=False
    )
    cc = D.connected_components(edges, "doc_a", "doc_b")
    return (
        cc.groupBy("component")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("node").alias("max_doc"),
        )
        .select(F.col("component").alias("cluster_id"), "n_docs", "max_doc")
        .orderBy("cluster_id")
    )


DOC_DUP_CLUSTERS_SQL = """
WITH RECURSIVE tok AS (
  SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
), sz AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM tok a JOIN tok b
    ON a.token = b.token AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach(src, dst) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
), comp AS (
  SELECT src AS node, least(src, min(dst)) AS component
  FROM reach GROUP BY src
)
SELECT component AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       max(node) AS max_doc
FROM comp
GROUP BY component
ORDER BY cluster_id
"""


def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation length percentiles per language — corpus
    distribution analysis ahead of filtering. Spark's ``percentile`` (exact,
    sort-based per group) vs DuckDB's ``quantile_cont``."""
    docs = load_table(spark, sf_dir, "documents")
    qs = F.expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.9D, 0.99D))")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            qs.alias("q"),
        )
        .select(
            "lang",
            "n_docs",
            *[
                F.round(F.col("q")[i], 4).alias(name)
                for i, name in enumerate(["p25", "p50", "p75", "p90", "p99"])
            ],
        )
        .orderBy("lang")
    )


DOC_LENGTH_QUANTILES_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(n_chars, 0.25), 4) AS p25,
       round(quantile_cont(n_chars, 0.5), 4) AS p50,
       round(quantile_cont(n_chars, 0.75), 4) AS p75,
       round(quantile_cont(n_chars, 0.9), 4) AS p90,
       round(quantile_cont(n_chars, 0.99), 4) AS p99
FROM documents
GROUP BY lang
ORDER BY lang
"""


def doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by arithmetic id hash
    (operators/sampling.py) — a pure per-row map, no shuffle, identical
    assignment in any engine. Per-split membership is pinned by count, a
    doc_id checksum, and the char total."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        SP.hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


DOC_TRAIN_SPLIT_SQL = """
SELECT CASE WHEN b < 0.8 THEN 'train' WHEN b < 0.9 THEN 'val' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT doc_id, n_chars,
         ((doc_id * 1103515245 + 12345) % 2147483648) / 2147483648.0 AS b
  FROM documents
)
GROUP BY 1
ORDER BY split
"""


def emb_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid analytics: element-wise mean vector per
    label (posexplode → keyed avg → re-assembled array), then each member's
    euclidean distance to its centroid via one zip_with/aggregate fold —
    the spread statistic a clustering-quality gate reads. Everything is
    JVM-side built-ins; the 64-dim centroid table is tiny (one row per
    label) and joins back broadcast-style under AQE."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    exploded = emb.select("vec_id", "label", F.posexplode(v).alias("pos", "x"))
    cent = (
        exploded.groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(v, F.col("centroid"), lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
    )
    return (
        emb.join(cent, "label")
        .select("label", dist.alias("d"))
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("d"), 4).alias("avg_dist"),
            F.round(F.max("d"), 4).alias("max_dist"),
        )
        .orderBy("label")
    )


EMB_CENTROID_SQL = """
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), exploded AS (
  SELECT vec_id, label,
         unnest(emb) AS x,
         unnest(range(1, array_length(emb) + 1)) AS i
  FROM v
), cent AS (
  SELECT label, i, avg(x) AS c FROM exploded GROUP BY label, i
), dist AS (
  SELECT e.vec_id, e.label, sqrt(sum((e.x - c.c) * (e.x - c.c))) AS d
  FROM exploded e JOIN cent c ON e.label = c.label AND e.i = c.i
  GROUP BY e.vec_id, e.label
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(d), 4) AS avg_dist,
       round(max(d), 4) AS max_dist
FROM dist
GROUP BY label
ORDER BY label
"""


QUERIES = {
    "doc_dup_clusters": doc_dup_clusters,
    "doc_length_quantiles": doc_length_quantiles,
    "doc_train_split": doc_train_split,
    "emb_centroid_per_label": emb_centroid_per_label,
}

ORACLES = {
    "doc_dup_clusters": DOC_DUP_CLUSTERS_SQL,
    "doc_length_quantiles": DOC_LENGTH_QUANTILES_SQL,
    "doc_train_split": DOC_TRAIN_SPLIT_SQL,
    "emb_centroid_per_label": EMB_CENTROID_SQL,
}


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling by language — the classic rebalance before
    training (keep 10% of the dominant 'en' stratum, 50% of the rest) —
    using the same deterministic per-row id hash as the splitter, so the
    sample is reproducible, engine-independent, and a pure scan-time
    filter (no shuffle, no sampleBy RNG state)."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 0.1).otherwise(0.5)
    return (
        docs.filter(SP.split_bucket("doc_id") < rate)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


DOC_STRATIFIED_SAMPLE_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT lang, doc_id, n_chars,
         ((doc_id * 1103515245 + 12345) % 2147483648) / 2147483648.0 AS b
  FROM documents
)
WHERE b < CASE WHEN lang = 'en' THEN 0.1 ELSE 0.5 END
GROUP BY lang
ORDER BY lang
"""


def doc_top_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: the 3 longest documents of every source (window
    row_number with a total tiebreak) — the keep-best-per-domain selection
    step of a curation pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "rk", "doc_id", "n_chars")
        .orderBy("source", "rk")
    )


DOC_TOP_PER_SOURCE_SQL = """
SELECT source, rk, doc_id, n_chars
FROM (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY n_chars DESC, doc_id) AS INT) AS rk
  FROM documents
)
WHERE rk <= 3
ORDER BY source, rk
"""


QUERIES.update(
    {
        "doc_stratified_sample": doc_stratified_sample,
        "doc_top_per_source": doc_top_per_source,
    }
)
ORACLES.update(
    {
        "doc_stratified_sample": DOC_STRATIFIED_SAMPLE_SQL,
        "doc_top_per_source": DOC_TOP_PER_SOURCE_SQL,
    }
)


def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition ratio — the Gopher-style quality signal
    (fraction of word 3-grams that are duplicates of an earlier 3-gram in
    the same doc): one per-row array fold, no shuffle until the per-source
    rollup. Flags the generated-text/boilerplate failure mode n-gram
    Jaccard can't see (it compares across docs, not within)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sh = D.shingles(toks, 3)
    rep = 1.0 - F.size(F.array_distinct(sh)) / F.size(sh)
    return (
        docs.select("source", rep.alias("rep_ratio"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("rep_ratio"), 4).alias("avg_rep"),
            F.sum((F.col("rep_ratio") > 0.2).cast("long")).alias("n_flagged"),
        )
        .orderBy("source")
    )


DOC_REPETITION_SQL = """
WITH per_doc AS (
  SELECT source,
         1.0 - list_unique(sh) * 1.0 / len(sh) AS rep_ratio
  FROM (
    SELECT source,
           list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
             i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')
           ) AS sh
    FROM documents
  )
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(rep_ratio), 4) AS avg_rep,
       CAST(sum(CASE WHEN rep_ratio > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM per_doc
GROUP BY source
ORDER BY source
"""


QUERIES.update({"doc_repetition_filter": doc_repetition_filter})
ORACLES.update({"doc_repetition_filter": DOC_REPETITION_SQL})


def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the 4× storage /
    bandwidth reduction an ANN index carries at 100 TB. Per vector:
    scale = 127/max|x|, q_i = floor(x_i·scale + 0.5) (explicit half-up — the
    engines' round() tie rules differ), reconstruction MSE from dequantized
    values. All higher-order array folds, zero shuffles before the per-label
    rollup; the quantized array is what a production pipeline would persist
    next to the centroid assignment."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = F.lit(127.0) / maxabs
    q = F.transform(v, lambda x: F.floor(x * F.col("_scale") + F.lit(0.5)))
    err2 = F.zip_with(
        v, F.col("_q"), lambda x, qq: F.pow(x - qq / F.col("_scale"), F.lit(2.0))
    )
    mse = F.aggregate(err2, F.lit(0.0), lambda a, x: a + x) / F.size(v)
    checksum = F.aggregate(
        F.col("_q"), F.lit(0).cast("long"), lambda a, x: a + F.abs(x).cast("long")
    )
    return (
        emb.filter(maxabs > 0)
        .withColumn("_scale", scale)
        .withColumn("_q", q)
        .select("label", mse.alias("_mse"), checksum.alias("_ck"))
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.round(F.avg("_mse"), 10).alias("avg_mse"),
            F.sum("_ck").cast("long").alias("q_checksum"),
        )
        .orderBy("label")
    )


EMB_QUANTIZE_SQL = """
WITH scaled AS (
  SELECT label, embedding,
         127.0 / list_aggregate(
           list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max'
         ) AS scale
  FROM embeddings
  WHERE list_aggregate(
          list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') > 0
),
per_vec AS (
  SELECT label,
         list_aggregate(
           list_transform(embedding,
             x -> pow(CAST(x AS DOUBLE)
                      - floor(CAST(x AS DOUBLE) * scale + 0.5) / scale, 2)),
           'sum') / len(embedding) AS mse,
         CAST(list_aggregate(
           list_transform(embedding,
             x -> abs(floor(CAST(x AS DOUBLE) * scale + 0.5))),
           'sum') AS BIGINT) AS ck
  FROM scaled
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(mse), 10) AS avg_mse,
       CAST(sum(ck) AS BIGINT) AS q_checksum
FROM per_vec
GROUP BY label
ORDER BY label
"""


def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check — the eval-hygiene pass every training
    pipeline runs: flag corpus documents sharing any word 5-gram with a
    held-out benchmark set (here: doc_id % 97 == 0). Both sides explode to
    distinct shingles; the benchmark side is tiny by construction, so the
    semi-join broadcasts under AQE at any corpus scale — the 100 TB fact
    side is one flat-map pass, never self-joined."""
    docs = load_table(spark, sf_dir, "documents")
    sh = F.array_distinct(D.shingles(F.split(F.col("text"), " "), 5))
    ex = docs.select("doc_id", F.explode(sh).alias("g"))
    is_bench = F.col("doc_id") % 97 == 0
    bench_grams = ex.filter(is_bench).select("g").distinct()
    contaminated = (
        ex.filter(~is_bench)
        .join(bench_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        docs.filter(~is_bench)
        .join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .orderBy("source")
    )


DOC_CONTAMINATION_SQL = """
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 4, 1) + 1),
           i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')
         ))) AS g
  FROM documents
),
bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
cont AS (
  SELECT DISTINCT doc_id FROM sh
  WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM bench)
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM cont)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
FROM documents
WHERE doc_id % 97 <> 0
GROUP BY source
ORDER BY source
"""


QUERIES.update(
    {"emb_quantize_int8": emb_quantize_int8, "doc_contamination": doc_contamination}
)
ORACLES.update(
    {"emb_quantize_int8": EMB_QUANTIZE_SQL, "doc_contamination": DOC_CONTAMINATION_SQL}
)


def doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end declarative curation — the whole pre-training data prep
    chain as ONE Catalyst plan: exact dedup (keep min doc_id per distinct
    text, window formulation: single shuffle, no join-back) → quality gate
    (100 ≤ n_chars ≤ 10000 and ≥ 10 tokens) → language allowlist → the
    deterministic LCG train/val/test split → per-(split, lang) audit row.

    Every stage is a built-in relational op, so at 100 TB the engine sees
    one pipeline: the dedup window and the final aggregate are the only
    data-scale exchanges (the trailing orderBy sorts a handful of audit
    rows), and nothing materializes between stages. The oracle replays the
    same chain via QUALIFY + CTEs."""
    docs = load_table(spark, sf_dir, "documents")
    keep = W.partitionBy("text")
    return (
        docs.withColumn("keeper", F.min("doc_id").over(keep))
        .filter(F.col("doc_id") == F.col("keeper"))
        .filter(F.col("n_chars").between(100, 10000))
        .filter(F.size(F.split("text", " ")) >= 10)
        .filter(F.col("lang").isin("en", "de", "fr"))
        .select("doc_id", "lang", "n_chars")
        .transform(lambda d: SP.hash_split(d, "doc_id"))
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


DOC_CURATION_SQL = """
WITH deduped AS (
  SELECT doc_id, lang, n_chars, text FROM documents
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)
), gated AS (
  SELECT doc_id, lang, n_chars,
         ((doc_id * 1103515245 + 12345) % 2147483648) / 2147483648.0 AS b
  FROM deduped
  WHERE n_chars BETWEEN 100 AND 10000
    AND len(string_split(text, ' ')) >= 10
    AND lang IN ('en', 'de', 'fr')
)
SELECT CASE WHEN b < 0.8 THEN 'train' WHEN b < 0.9 THEN 'val' ELSE 'test' END AS split,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM gated
GROUP BY 1, 2
ORDER BY split, lang
"""


QUERIES.update({"doc_curation_pipeline": doc_curation_pipeline})
ORACLES.update({"doc_curation_pipeline": DOC_CURATION_SQL})


def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with the BPE-ish regex pre-tokenizer
    (operators/text.py:BPE_PRETOKEN_RE) next to plain whitespace words —
    the sizing stat a training pipeline budgets against. The pattern is
    RE2-compatible by construction, so the oracle runs the IDENTICAL regex
    in DuckDB and the split must agree token-for-token; the per-source
    aggregate compares total/ distinct counts and the bpe:word ratio."""
    from promhouse_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        X.bpe_pretoken_count("text").alias("n_bpe"),
        X.token_count("text").alias("n_words"),
        F.size(F.array_distinct(X.bpe_pretokens("text"))).cast("long").alias("n_bpe_distinct"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("n_bpe").cast("long").alias("total_bpe"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_bpe_distinct").cast("long").alias("total_bpe_distinct"),
            F.round(F.sum("n_bpe") / F.sum("n_words"), 4).alias("bpe_per_word"),
        )
        .orderBy("source")
    )


DOC_BPE_TOKENS_SQL = """
WITH per_doc AS (
  SELECT source,
         len(list_filter(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'),
             x -> trim(x) <> '')) AS n_bpe,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(list_filter(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'),
             x -> trim(x) <> ''))) AS n_bpe_distinct
  FROM documents
)
SELECT source,
       CAST(sum(n_bpe) AS BIGINT) AS total_bpe,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(sum(n_bpe_distinct) AS BIGINT) AS total_bpe_distinct,
       round(sum(n_bpe) * 1.0 / sum(n_words), 4) AS bpe_per_word
FROM per_doc
GROUP BY source
ORDER BY source
"""

QUERIES.update({"doc_bpe_tokens": doc_bpe_tokens})
ORACLES.update({"doc_bpe_tokens": DOC_BPE_TOKENS_SQL})
