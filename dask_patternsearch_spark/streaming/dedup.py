"""Incremental near-duplicate filtering over a document stream.

The production LLM-corpus shape: documents arrive continuously, and each
new document must be dropped if it near-duplicates anything ALREADY KEPT
-- without ever re-scanning the historical corpus.  ``foreachBatch``
carries MinHash banding across micro-batches through a persistent band
ledger: per batch, O(batch) signature work plus one semi join against the
ledger's (band, bucket) keys.

Contract (deterministic): a document is DROPPED iff it shares a band
bucket with a smaller-doc_id document in its own batch, or with any
previously kept document.  Survivors append their bands to the ledger.

Scale: the ledger stores (band, bucket, doc_id) rows for KEPT docs only
-- a few dozen longs per document, far smaller than text.  The per-batch
semi join keys on (band, bucket); with the ledger written partitioned by
band it prunes to matching partitions.  Plain parquet append keeps this
container-friendly; at real scale the same body targets Delta/Iceberg
(atomic append) or a key-value store -- the structure is what carries
over, exactly as for ``streaming.events.upsert_ledger_stream``.

Reference note: this is the streaming generalization of the reference's
memo-table dedup probe (``/root/reference/dask_patternsearch/search.py:
285-291``) -- "have we seen this before" against an ever-growing ledger,
here with near-duplicate rather than exact-bytes identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def neardup_filter_stream(
    docs_stream: DataFrame,
    bands_path: str,
    kept_path: str,
    checkpoint_path: str,
    n: int = 3,
    n_perm: int = 64,
    n_bands: int = 8,
) -> None:
    """Run the incremental filter to completion (availableNow trigger).

    ``docs_stream`` must provide (doc_id, text).  Kept doc_ids land in
    ``kept_path`` (with their batch_id); kept documents' bands accumulate
    in ``bands_path``.
    """
    from ..operators.dedup import _band_buckets, minhash_signatures

    rows_per_band = n_perm // n_bands

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        sigs = minhash_signatures(batch_df, n=n, n_perm=n_perm).localCheckpoint(
            eager=True
        )
        bands = _band_buckets(sigs, n_bands, rows_per_band).localCheckpoint(
            eager=True
        )
        # existence check, not try/except: a read of the not-yet-written
        # ledger would surface as a logged ExecutionListener ERROR even
        # though caught (noisy and indistinguishable from a real failure)
        jvm = sp.sparkContext._jvm
        hconf = sp.sparkContext._jsc.hadoopConfiguration()
        dst = jvm.org.apache.hadoop.fs.Path(bands_path)
        if dst.getFileSystem(hconf).exists(dst):
            ledger = sp.read.parquet(bands_path).select("band", "bucket").distinct()
            dup_vs_ledger = bands.join(
                ledger, ["band", "bucket"], "left_semi"
            ).select("doc_id")
        else:  # first batch: no ledger yet
            dup_vs_ledger = sp.createDataFrame([], "doc_id long")
        dup_in_batch = (
            bands.alias("x")
            .join(
                bands.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("y.doc_id") < F.col("x.doc_id")),
            )
            .select(F.col("x.doc_id").alias("doc_id"))
        )
        dups = dup_vs_ledger.unionByName(dup_in_batch).distinct()
        kept = (
            sigs.select("doc_id")
            .join(dups, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        bands.join(kept, "doc_id", "left_semi").write.mode("append").parquet(
            bands_path
        )
        kept.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            kept_path
        )

    q = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_docs_stream(
    spark: SparkSession,
    docs_dir: str,
    max_files_per_trigger: int | None = None,
    glob: str | None = None,
) -> DataFrame:
    """File-source document stream.  ``docs_dir`` must be a DIRECTORY
    (Spark's file source rejects a bare file as basePath); pass ``glob``
    to restrict which files in it are streamed."""
    sample = f"{docs_dir}/{glob}" if glob else docs_dir
    static = spark.read.parquet(sample)
    reader = spark.readStream.schema(static.schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(docs_dir)


def ingest_keepers_stream(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_path: str,
    auto_compact: bool = False,
    **ingest_kwargs,
) -> None:
    """Continuous corpus ingestion as a STREAM: every micro-batch of
    documents runs the full incremental loop
    (``operators.dedup.ingest_batch``: batch-only shingling + signature
    append, label-delta append for touched clusters, keeper re-pick +
    merge tombstones) against the persistent state directory -- the
    foreachBatch posture a production 100 TB/day feed uses, with the
    micro-batch as the ingest unit.

    EXACTLY-ONCE composition for free: ``ingest_batch``'s content-derived
    batch stamps make a REPLAYED micro-batch (restart after a sink-side
    failure, a rewound checkpoint, even a fresh checkpoint over the same
    files) a state no-op, so the stream needs no transactional sink --
    the idempotence lives in the state protocol, not the checkpoint.
    And because sequential ``ingest_batch`` calls compose to the
    from-scratch build regardless of how documents are SPLIT into
    batches, the drained stream's resolved state is independent of
    micro-batch boundaries -- which is what makes the registered
    ``streaming_ingest_keepers`` query hash-checkable against the same
    full-recompute oracle as the batch path.

    ``auto_compact=True`` runs the maintenance trigger
    (``maybe_compact_dedup_state``: gap-ratio gated, a cheap check per
    micro-batch) after each ingest, so a long-running feed's LSM read
    amplification stays bounded without an external scheduler.

    Drains to completion (availableNow trigger).
    """
    from ..operators import dedup as bdedup

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bdedup.ingest_batch(batch_df, state_dir, **ingest_kwargs)
        if auto_compact:
            bdedup.maybe_compact_dedup_state(batch_df.sparkSession, state_dir)

    q = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cdc_rewrite_stream(
    docs_stream: DataFrame,
    state_dir: str,
    output_path: str,
    checkpoint_path: str,
    window: int = 4,
    auto_compact: bool = False,
) -> None:
    """Duplicated-span removal as a STREAM: every micro-batch runs
    ``operators.dedup.ingest_cdc_batch`` against the persistent
    chunk-hash ledger and lands its rewritten documents under
    ``output_path`` -- the continuous form of the Lee et al. 2022
    training-data transform (span-level, not document-level: the
    arriving text itself is cleaned against everything already seen).

    Exactly-once END TO END without a transactional sink, at both
    levels of state:
    * ledger -- ``ingest_cdc_batch``'s content stamps make a replayed
      micro-batch a state no-op (same protocol as
      ``ingest_keepers_stream``);
    * output -- each micro-batch's rewrite is written by OVERWRITE into
      a subdirectory keyed by the same content stamp, so a replay lands
      byte-identically on top of itself instead of appending
      duplicates.  Readers take ``output_path/*`` as one relation.

    Because sequential ingest calls compose to the one-shot
    arrival-order keep-first regardless of how documents are split into
    micro-batches, the drained output over id-ordered micro-batches is
    hash-checkable against the SAME oracle as the batch path
    (registered ``streaming_cdc_rewrite``).  Drains to completion
    (availableNow trigger)."""
    from ..operators import dedup as bdedup

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stamp = "cdc-" + bdedup._batch_stamp(batch_df)
        rewritten = bdedup.ingest_cdc_batch(batch_df, state_dir, window=window)
        rewritten.write.mode("overwrite").parquet(f"{output_path}/{stamp}")
        if auto_compact:
            # maintenance trigger per micro-batch (metadata-sized checks:
            # bloom rows/prefix, orphan mass, re-bucket pressure) so
            # ledger debris and bloom read amplification stay bounded on
            # a long-running feed without an external scheduler
            bdedup.maybe_compact_cdc_state(batch_df.sparkSession, state_dir)

    q = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
