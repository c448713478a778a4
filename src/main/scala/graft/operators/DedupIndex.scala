package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Persisted incremental-dedup index: the 100 TB ingestion pattern that
  * `dedup_incremental` (inline derivation, same joins via
  * [[dedupAgainst]] — one definition, two backings) only *describes*,
  * made concrete as two parquet tables:
  *
  *   <dir>/fp     — distinct md5 content fingerprints of the accepted corpus
  *   <dir>/bands  — distinct (band, sig) minhash LSH band index rows
  *
  * Ingestion cycle (reference analog: the already-processed check in
  * frappe_data_pipelines' backfill, api.py bulk path, generalized to
  * content identity): `dedupBatch` runs the incoming batch against the
  * stored index (one anti-join on fp, one left_semi on bands — both
  * batch-sized equi-joins), then `accept` lands the survivors' fp and
  * band rows. No full-corpus recompute, no O(corpus²) self-join ever.
  *
  * Crash safety: `accept` writes each batch to its own `batch_id`
  * partition with DYNAMIC partition overwrite (the same idempotent-sink
  * shape as the streaming relay). A crash between the fp write and the
  * bands write leaves a torn index, but retrying `accept` with the SAME
  * batch id overwrites exactly its own partition on both tables — the
  * retry heals the tear and can never double-append. Both tables carry
  * the partition column; index readers join only on fp / (band, sig).
  *
  * Appends stay exactly equal to a from-scratch rebuild because accepted
  * rows are, by construction, disjoint from the stored index on both keys:
  * an accepted doc's fp was absent from fp (anti-join) and none of its
  * (band, sig) rows hit bands (semi-join produced no match). Within-batch
  * duplicates are collapsed by the per-batch `distinct()`.
  * DedupIndexSpec asserts equivalence and accept-retry idempotency.
  */
object DedupIndex {

  /** Distinct content fingerprints of `docs` (column `fp`). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(md5(col("text").cast("binary")).as("fp")).distinct()

  /** Distinct minhash LSH band rows of `docs` (columns `band`, `sig`). */
  def bandRows(docs: DataFrame): DataFrame =
    docs
      .select(posexplode(TextOps.minhashBandsUdf(col("text"))).as(Seq("band", "sig")))
      .distinct()

  /** Build the index from an initial corpus (batch 0; full overwrite via
    * [[graft.BatchSink]], which pins STATIC overwrite so a rebuild can
    * never leave stale incremental partitions behind).
    */
  def init(docs: DataFrame, dir: String): Unit = {
    graft.BatchSink.writeBatch(fingerprints(docs), 0L, s"$dir/fp", full = true)
    graft.BatchSink.writeBatch(bandRows(docs), 0L, s"$dir/bands", full = true)
  }

  /** The incremental-dedup join pipeline itself, independent of how the
    * existing-side index is backed: exact dupes fall to an anti-join on
    * the content fingerprint, near-dups to a left_semi against the
    * minhash LSH band index, and WITHIN-batch exact duplicates collapse
    * to the smallest doc_id — without that last step, two same-content
    * docs arriving in one batch would BOTH survive (the index only
    * holds earlier batches) while `accept`'s distinct() lands one fp
    * row, leaving downstream sinks (the ANN inverted file) with more
    * vectors than the dedup index has contents. Within-batch NEAR-dups
    * are deliberately out of scope here — that is the full pair problem
    * the batch operators (dedup_minhash_*) own.
    * `dedup_incremental` (inline, oracle-replayable) and [[dedupBatch]]
    * (parquet-backed) are both this function — the single source of
    * truth DedupIndexSpec pins. Returns the accepted rows (all incoming
    * columns plus `fp`).
    */
  def dedupAgainst(incoming: DataFrame, existingFp: DataFrame,
                   existingBands: DataFrame): DataFrame = {
    val exactNew = incoming
      .withColumn("fp", md5(col("text").cast("binary")))
      .join(existingFp.select("fp"), Seq("fp"), "left_anti")
    val nearDupIds = exactNew
      .select(col("doc_id"), posexplode(TextOps.minhashBandsUdf(col("text"))).as(Seq("band", "sig")))
      .join(existingBands.select("band", "sig"), Seq("band", "sig"), "left_semi")
      .select(col("doc_id")).distinct()
    val survivors = exactNew.join(nearDupIds, Seq("doc_id"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
    survivors
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Dedup `incoming` against the stored index. */
  def dedupBatch(spark: SparkSession, dir: String, incoming: DataFrame): DataFrame =
    dedupAgainst(incoming,
      spark.read.parquet(s"$dir/fp"), spark.read.parquet(s"$dir/bands"))

  /** Dedup `incoming` against the index as it stood BEFORE `batchId`:
    * the read is pinned to earlier batch partitions (a partition-pruned
    * filter on the `batch_id` partition column — no data files of later
    * batches are touched). A whole-cycle retry of a batch whose `accept`
    * already landed then re-derives the SAME survivor set instead of
    * dropping the batch against its own rows — which is what makes the
    * full ingest cycle (dedup → accept → embed → ANN add) idempotent
    * under crash-retry END TO END, not just each sink in isolation
    * (IngestLifecycleSpec drives the cross-index proof).
    */
  def dedupBatch(spark: SparkSession, dir: String, incoming: DataFrame,
                 batchId: Long): DataFrame =
    dedupAgainst(incoming,
      spark.read.parquet(s"$dir/fp").filter(col("batch_id") < batchId),
      spark.read.parquet(s"$dir/bands").filter(col("batch_id") < batchId))

  /** Land an ACCEPTED batch (output of `dedupBatch`) in the index under
    * its own `batch_id` partition. Idempotent per batch id: a retry
    * after a crash overwrites its own partition instead of appending a
    * second copy.
    */
  def accept(accepted: DataFrame, dir: String, batchId: Long): Unit = {
    graft.BatchSink.writeBatch(fingerprints(accepted), batchId, s"$dir/fp", full = false)
    graft.BatchSink.writeBatch(bandRows(accepted), batchId, s"$dir/bands", full = false)
  }

  /** Fold all batch partitions of both tables into the high-water
    * batch id — small-file
    * hygiene after many accepted batches. Crash-safe write-then-swap
    * ([[graft.BatchSink.compact]]). QUIESCENCE MATTERS MORE HERE than
    * for the ANN tables: the batch-pinned reader (`dedupBatch(...,
    * batchId)` reads `batch_id < batchId`) relies on batch history for
    * whole-cycle crash-retry idempotency, and compaction rewrites that
    * history — so compact only when no batch can be retried (stream
    * stopped with its checkpoint committed, or between batch jobs).
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    graft.BatchSink.compact(spark, s"$dir/fp")
    graft.BatchSink.compact(spark, s"$dir/bands")
  }

  /** BUCKETED index layout — the far-scale variant of the parquet-dir
    * index (PLANS.md round 10, prof24): the plain layout's per-batch
    * anti/semi joins shuffle the INDEX side every increment (a
    * left-anti/semi probe cannot broadcast its stream side), which is
    * the linear term once the index dwarfs the batch. Storing `fp` and
    * `bands` as catalog tables bucketed on their join keys satisfies
    * the join's distribution requirement from the files themselves, so
    * each increment exchanges only the (tiny) incoming batch — the
    * index-side shuffle disappears from the plan
    * (DedupIndexBucketedSpec asserts the exchange count drops vs the
    * unbucketed plan, with output parity).
    *
    * Batches land with `mode(Append)` into the bucketed tables; the
    * crash-retry idempotency story stays with the partitioned parquet
    * layout (`accept`/`dedupBatch(batchId)`) — this layout is the
    * co-location optimization for the steady-state corpus, reached via
    * periodic promotion (e.g. at `compact` time), not the hot
    * retry-window sink.
    */
  def acceptBucketed(accepted: DataFrame, fpTable: String, bandsTable: String,
                     buckets: Int = 8): Unit = {
    fingerprints(accepted).write.mode("append")
      .bucketBy(buckets, "fp").sortBy("fp").format("parquet")
      .saveAsTable(fpTable)
    bandRows(accepted).write.mode("append")
      .bucketBy(buckets, "band", "sig").sortBy("band", "sig").format("parquet")
      .saveAsTable(bandsTable)
  }

  /** Dedup `incoming` against the bucketed index tables — identical
    * join pipeline ([[dedupAgainst]], single source of truth), the
    * bucketed scans just satisfy its distribution requirements for free.
    */
  def dedupBatchBucketed(spark: SparkSession, fpTable: String, bandsTable: String,
                         incoming: DataFrame): DataFrame =
    dedupAgainst(incoming, spark.table(fpTable), spark.table(bandsTable))
}
