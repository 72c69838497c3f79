"""Hand-rolled Lloyd's k-means over an embedding column — the coarse
quantizer / topic-blocking fit (SemDeDup's clustering stage, IVF's
quantizer) with a VERIFIABLE training trajectory.

Why this exists next to ``similarity.ivf_index`` (MLlib KMeans): the
MLlib fit is a black box to a SQL differential oracle — those queries
stage the fitted centroids and verify only what's downstream. Here each
Lloyd iteration is built from the same SQL-replayable primitives as
``ivf_assign`` (sequential zip-fold squared-L2 argmin, smallest-cid
tie-break) plus one keyed aggregation for the means, so a DuckDB oracle
can unroll the iterations as a chained CTE and land on bit-identical
centroids — the same verified-training contract as operators/hashlr.py.

Spark shape (what must survive 100 TB):
  - assignment is a pure column expression over centroid LITERALS
    (k·dim multiply-adds per row inside whole-stage codegen — no join,
    no shuffle);
  - the mean recompute is one keyed aggregation with ``dim``
    per-coordinate avg columns (k·(dim+1) doubles shuffled/collected as
    index metadata — the bounded-collect contract the ANN operators
    follow);
  - iteration count is a fixed hyper-parameter;
  - serving-scale assignment has an Arrow-batched numpy twin
    (:func:`assign_with_dist_vectorized`) for when oracle-exactness is
    not required.

Determinism contract: centroid coordinates quantize to 1e-7 after every
iteration in both engines, crushing aggregation-order float drift
(~1e-15) so the unrolled oracle reproduces the trajectory exactly (the
driver side rounds half-away-from-zero via functions/quantize.py to
match DuckDB's mode — Python's half-to-even builtin would diverge at an
exact midpoint).
Init is the k lowest-id vectors (deterministic, SQL-replayable);
production would swap in k-means|| over a sample — the iteration shape
is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from promhouse_spark.functions.quantize import quantize


def assign_with_dist(
    df: DataFrame,
    centers: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment keeping the squared-L2 distance:
    the ``similarity.ivf_assign`` argmin (sequential zip-fold, struct-min
    on (distance, cid)) with both struct fields surfaced.

    Evaluation-strategy note (measured at sf10, 2M x 8 x 64): the
    zip-fold, though interpreted (higher-order lambdas get no codegen),
    BEATS a flat k·dim-term unrolled expression — the ~2000-node tree
    exceeds codegen budgets and falls back to node-at-a-time interpreted
    eval (42 s fold vs 57-60 s unrolled, both struct-min and least()
    argmins). Keep the fold."""
    v = F.col(vec_col).cast("array<double>")
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(float(x)) for x in c]).alias("c"),
            )
            for i, c in enumerate(centers)
        ]
    )
    dists = F.transform(
        cent_arr,
        lambda s: F.struct(
            F.aggregate(
                F.zip_with(s["c"], v, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            s["cid"].alias("cid"),
        ),
    )
    best = F.array_min(dists)
    return df.withColumn("centroid_id", best["cid"]).withColumn(
        "dist", best["d"]
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 7,
    assign_fn=None,
) -> list[list[float]]:
    """Lloyd's algorithm: assign (map-side argmin over centroid
    literals) then re-center (one keyed agg per iteration, k·dim rows
    collected). Empty clusters keep their previous centroid. Returns the
    fitted centroid list.

    ``assign_fn`` picks the assignment kernel for the training loop:
    default :func:`assign_with_dist` (the oracle-exact column fold —
    required when a SQL oracle replays the trajectory), or pass
    :func:`assign_with_dist_vectorized` for serving-scale fits where
    bit-exactness vs a sequential engine is not needed (measured 9×
    per pass at sf10; centroids can differ only if some vector is a
    near-exact tie between two centroids during training)."""
    if assign_fn is None:
        assign_fn = assign_with_dist
    seeds = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    centers = [[float(x) for x in r["v"]] for r in seeds]
    dim = len(centers[0]) if centers else 0
    v = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        assigned = assign_fn(df, centers, vec_col)
        # per-coordinate avg as `dim` aggregate columns in ONE keyed agg —
        # not posexplode: exploding N×dim rows through a shuffle per
        # iteration dominated the fit at sf10 (128M-row explodes, 44 s);
        # column aggregates combine map-side and shuffle k×(dim+1) doubles
        means = (
            assigned.groupBy("centroid_id")
            .agg(
                *[
                    F.avg(F.element_at(v, i + 1)).alias(f"m{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        new = [list(c) for c in centers]
        for r in means:
            new[r["centroid_id"]] = [
                quantize(r[f"m{i}"], quant) for i in range(dim)
            ]
        centers = new
    return centers


def assign_with_dist_vectorized(
    df: DataFrame,
    centers: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched numpy assignment — the 100 TB serving path for the
    fitted model. The column-expression fold above is the ORACLE-exact
    form (sequential float accumulation a SQL engine replays bit-for-bit)
    but evaluates interpreted at ~1 µs per (row, centroid); this kernel
    does the same k x dim argmin as one BLAS-shaped batch op per Arrow
    batch (||v||² - 2 v·Cᵀ + ||c||², then the true squared distance
    recomputed for the winner only). Measured at sf10 (2M x 8 x 64):
    0.81 s vs the fold's 7.57 s. Distances can differ from the fold
    in the last ulp (pairwise vs sequential summation), so near-exact
    ties may break differently — use the fold when differential
    verification needs bit-exact assignment (the registered query does);
    tests/test_kmeans.py pins agreement on real data."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    C = np.asarray(centers, dtype=np.float64)  # k x dim
    c_sq = (C * C).sum(axis=1)  # k

    schema = T.StructType(
        [
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("dist", T.DoubleType()),
        ]
    )

    def kernel(vecs):
        V = np.asarray(vecs.tolist(), dtype=np.float64)  # n x dim
        if V.size == 0:
            return pd.DataFrame({"centroid_id": [], "dist": []})
        # rank by the norm trick (monotone in true distance per row)
        rank = V @ C.T * -2.0 + c_sq  # n x k
        cid = rank.argmin(axis=1)
        # ties: argmin already takes the first (smallest cid) occurrence
        diff = V - C[cid]
        dist = (diff * diff).sum(axis=1)
        return pd.DataFrame(
            {"centroid_id": cid.astype("int32"), "dist": dist}
        )

    # struct-returning SCALAR pandas UDF (pd.Series -> pd.DataFrame);
    # built without type hints — the hinted form trips the 4.x signature
    # inference for struct returns
    kernel_udf = F.pandas_udf(kernel, returnType=schema)
    out = df.withColumn(
        "_a", kernel_udf(F.col(vec_col).cast("array<double>"))
    )
    return (
        out.withColumn("centroid_id", F.col("_a.centroid_id"))
        .withColumn("dist", F.col("_a.dist"))
        .drop("_a")
    )
