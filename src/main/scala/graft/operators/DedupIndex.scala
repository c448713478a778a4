package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Persisted incremental-dedup index: the 100 TB ingestion pattern that
  * `dedup_incremental` (RelationalQueries-style inline derivation) only
  * *describes*, made concrete as two parquet tables:
  *
  *   <dir>/fp     — distinct md5 content fingerprints of the accepted corpus
  *   <dir>/bands  — distinct (band, sig) minhash LSH band index rows
  *
  * Ingestion cycle (reference analog: the already-processed check in
  * frappe_data_pipelines' backfill, api.py bulk path, generalized to
  * content identity): `dedupBatch` runs the incoming batch against the
  * stored index (one anti-join on fp, one left_semi on bands — both
  * batch-sized equi-joins), then `accept` appends the survivors' fp and
  * band rows. No full-corpus recompute, no O(corpus²) self-join ever.
  *
  * Appends stay exactly equal to a from-scratch rebuild because accepted
  * rows are, by construction, disjoint from the stored index on both keys:
  * an accepted doc's fp was absent from fp (anti-join) and none of its
  * (band, sig) rows hit bands (semi-join produced no match). Within-batch
  * duplicates are collapsed by the per-batch `distinct()`.
  * DedupIndexSpec asserts this equivalence end-to-end.
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

  /** Build the index from an initial corpus. */
  def init(docs: DataFrame, dir: String): Unit = {
    fingerprints(docs).write.mode("overwrite").parquet(s"$dir/fp")
    bandRows(docs).write.mode("overwrite").parquet(s"$dir/bands")
  }

  /** Dedup `incoming` against the stored index. Returns the accepted rows
    * (all incoming columns plus `fp`): exact dupes removed by the fp
    * anti-join, near-dups by the LSH band semi-join — the same two joins
    * as the `dedup_incremental` query, but against parquet-backed tables.
    */
  def dedupBatch(spark: SparkSession, dir: String, incoming: DataFrame): DataFrame = {
    val existingFp = spark.read.parquet(s"$dir/fp")
    val existingBands = spark.read.parquet(s"$dir/bands")
    val exactNew = incoming
      .withColumn("fp", md5(col("text").cast("binary")))
      .join(existingFp, Seq("fp"), "left_anti")
    val nearDupIds = exactNew
      .select(col("doc_id"), posexplode(TextOps.minhashBandsUdf(col("text"))).as(Seq("band", "sig")))
      .join(existingBands, Seq("band", "sig"), "left_semi")
      .select(col("doc_id")).distinct()
    exactNew.join(nearDupIds, Seq("doc_id"), "left_anti")
  }

  /** Append an ACCEPTED batch (output of `dedupBatch`) to the index. */
  def accept(accepted: DataFrame, dir: String): Unit = {
    fingerprints(accepted).write.mode("append").parquet(s"$dir/fp")
    bandRows(accepted).write.mode("append").parquet(s"$dir/bands")
  }
}
