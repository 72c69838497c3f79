"""Streaming near-duplicate gate for incoming documents (beyond-reference).

The batch MinHash+LSH dedup (operators/dedup.py) answers "which existing
docs duplicate each other"; an ingestion pipeline needs the ONLINE version:
as documents arrive, drop the ones that near-duplicate anything ALREADY
ACCEPTED, and register the survivors — the admission-control stage every
continuously-fed training corpus runs.

Shape (foreachBatch over any streaming source):

1. signatures for the micro-batch — the same shuffle-free per-row fold as
   the batch operator (one pass, no exchange);
2. banded LSH probe of the batch against the persisted signature store — an
   equi-join on (band, bucket); the store is bucketed-by-band parquet so at
   100 TB each probe touches only matching buckets, and the exchange moves
   only (id, band, bucket) triples;
3. candidate pairs are verified on full signatures (estimated Jaccard ≥
   threshold) — same estimator as the batch path;
4. intra-batch dups resolve by min doc_id (the batch LSH self-join at
   micro-batch size);
5. survivors append their signatures to the store — the next batch probes
   against them (strict monotone growth, no rewrite).

The store is the ONLY cross-batch state and it is append-only parquet — no
driver-side collections, restart-safe (checkpointed source offsets +
idempotent-by-doc_id store writes)."""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from promhouse_spark.operators import dedup as D


def _banded(sig: DataFrame, num_hashes: int, bands: int, id_col: str) -> DataFrame:
    rows = num_hashes // bands
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.slice("signature", i * rows + 1, rows)
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


class StreamingDocDedup:
    """Admission-control dedup over a persisted signature store."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = 48,
        bands: int = 12,
        threshold: float = 0.7,
        seed: int = 42,
    ) -> None:
        self.spark = spark
        self.store_path = store_path
        self.id_col = id_col
        self.text_col = text_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.threshold = threshold
        self.seed = seed

    def _store(self) -> DataFrame | None:
        # Only a *missing* store means "first batch"; any other failure
        # (transient FS error, corrupted parquet) must propagate — silently
        # skipping the store would admit duplicates.
        try:
            return self.spark.read.parquet(self.store_path)
        except AnalysisException as exc:
            msg = str(exc)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                return None
            raise

    def admit_batch(self, batch_df: DataFrame) -> DataFrame:
        """Dedup one micro-batch against the store AND itself; append the
        survivors' signatures to the store; return the admitted rows."""
        idc, thr = self.id_col, self.threshold
        sig = D.minhash_signatures(
            batch_df, idc, self.text_col, self.num_hashes, 3, self.seed
        ).localCheckpoint()  # small; breaks lineage so it's computed once

        # --- vs the store ---
        store = self._store()
        dup_vs_store = None
        if store is not None:
            probe = _banded(sig, self.num_hashes, self.bands, idc)
            hist = _banded(
                store.select(F.col(idc).alias("__hid"), "signature"),
                self.num_hashes,
                self.bands,
                "__hid",
            )
            cand = (
                probe.join(hist, ["band", "bucket"])
                # A doc re-processed after a foreachBatch retry finds its OWN
                # stored signature (est_jaccard = 1.0); that self-match must
                # not reject a previously-admitted row.
                .filter(F.col(idc) != F.col("__hid"))
                .select(idc, "__hid")
                .dropDuplicates([idc, "__hid"])
            )
            est = F.size(
                F.filter(
                    F.zip_with("signature", "__hsig", lambda x, y: (x == y).cast("int")),
                    lambda v: v == 1,
                )
            ) / F.lit(self.num_hashes)
            dup_vs_store = (
                cand.join(sig, idc)
                .join(
                    store.select(
                        F.col(idc).alias("__hid"), F.col("signature").alias("__hsig")
                    ),
                    "__hid",
                )
                .filter(est >= thr)
                .select(idc)
                .distinct()
            )

        # --- intra-batch: keep the min id of every near-dup pair ---
        pairs = D.minhash_lsh_candidates(
            batch_df, idc, self.text_col, self.num_hashes, self.bands, 3, self.seed
        ).filter(F.col("est_jaccard") >= thr)
        dup_in_batch = pairs.select(F.col("doc_b").alias(idc)).distinct()

        rejected = (
            dup_in_batch
            if dup_vs_store is None
            else dup_vs_store.unionByName(dup_in_batch).distinct()
        )
        admitted = batch_df.join(rejected, idc, "left_anti")
        admitted_sig = sig.join(rejected, idc, "left_anti")
        if store is not None:
            # Retry idempotence: a doc_id already registered (crash after the
            # store append, before the sink/offset commit) must not append a
            # second signature row.
            admitted_sig = admitted_sig.join(
                store.select(idc).distinct(), idc, "left_anti"
            )
        admitted_sig.write.mode("append").parquet(self.store_path)
        return admitted

    def foreach_batch(self, batch_df: DataFrame, _epoch: int) -> None:
        self.admit_batch(batch_df)
