package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE idempotent batch-partitioned parquet writer — single definition
  * behind every crash-safe sink in the engine (the streaming ingest
  * relay, DedupIndex, AnnIndex), so the retry guarantees live in one
  * place instead of drifting across copies.
  *
  * Semantics:
  *  - every write lands under the batch's own `batch_id=<n>` partition
  *    (plus any extra partition columns);
  *  - `full = false` (incremental): DYNAMIC partition overwrite — a
  *    crashed or retried batch overwrites exactly its own partition
  *    leaves and can never double-append;
  *  - `full = true` (rebuild): overwrite mode pinned STATIC explicitly,
  *    so a rebuild truncates the whole table even if the session
  *    default was flipped to dynamic — stale partitions from prior
  *    incremental batches cannot survive a rebuild;
  *  - with extra partition columns the rows are repartitioned by them
  *    first: otherwise every task writes one file per partition value
  *    it holds (tasks × values small files — the classic partitioned-
  *    write failure mode at scale).
  */
object BatchSink {
  def writeBatch(df: DataFrame, batchId: Long, path: String, full: Boolean,
                 extraPartitionCols: Seq[String] = Nil): Unit = {
    val data =
      if (extraPartitionCols.nonEmpty) df.repartition(extraPartitionCols.map(col): _*)
      else df
    val w = data.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .partitionBy("batch_id" +: extraPartitionCols: _*)
      .option("partitionOverwriteMode", if (full) "static" else "dynamic")
    w.parquet(path)
  }

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Heal a torn [[replaceTable]]: if the live table is missing but a
    * COMPLETED `.swap` (its `_SUCCESS` marker exists — the committer
    * writes it last, so a partial write can never be promoted) is
    * present, promote it; then clear any leftover `.old`/incomplete
    * `.swap`. Idempotent; called automatically by [[replaceTable]] and
    * safe to call before any read of a table that may have been
    * mid-replacement at crash time.
    */
  def recoverSwap(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsOf(spark, path)
    val swap = new org.apache.hadoop.fs.Path(path + ".swap")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    val swapComplete = fs.exists(swap) &&
      fs.exists(new org.apache.hadoop.fs.Path(path + ".swap/_SUCCESS"))
    if (!fs.exists(p) && swapComplete) fs.rename(swap, p)
    if (fs.exists(p)) { // only clean up once a live table is in place
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(swap)) fs.delete(swap, true)
    }
  }

  /** Crash-safe FULL-table replacement — write-then-swap, the primitive
    * behind index compaction and retraining. `df` (which MAY read from
    * `path` itself — the write targets `.swap`, so the source stays
    * intact until the data is fully committed) is written as a fresh
    * batch-0 table beside the live one, row-count-verified against its
    * own plan, then swapped in with two renames. Crash windows:
    * before/during the write → live table untouched, partial `.swap`
    * ignored (no `_SUCCESS`); between the renames → healed by
    * [[recoverSwap]]; after → only a stale `.old` to sweep. At no point
    * can a reader observe a half-replaced table, and rows can never be
    * lost without [[recoverSwap]] getting them back.
    */
  def replaceTable(df: DataFrame, path: String,
                   extraPartitionCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    recoverSwap(spark, path)
    val swapPath = path + ".swap"
    // row-count verification rides the write itself (CollectMetrics on
    // the write's own plan — no second execution of the derivation),
    // compared against the swap table's parquet footers
    val obs = org.apache.spark.sql.Observation()
    writeBatch(df.observe(obs, count(lit(1)).as("n")), 0L, swapPath,
      full = true, extraPartitionCols)
    val expected = obs.get("n").asInstanceOf[Long]
    val written = spark.read.parquet(swapPath).count() // parquet footers only
    require(written == expected,
      s"BatchSink.replaceTable: swap table at $swapPath has $written rows, expected $expected — aborting swap")
    val (fs, p) = fsOf(spark, path)
    val swap = new org.apache.hadoop.fs.Path(swapPath)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(p)) fs.rename(p, old)
    fs.rename(swap, p)
    fs.delete(old, true)
    spark.catalog.refreshByPath(path) // drop cached file listings of the old table
  }

  /** Fold every `batch_id=N` partition of a [[writeBatch]]-maintained
    * table into a single batch-0 partition — the small-file compaction a
    * streaming sink needs (#batches × #values parquet leaves otherwise;
    * the classic micro-batch sink degradation). Crash-safe via
    * [[replaceTable]]. MUST only run while the table is quiesced (no
    * in-flight batch, streaming checkpoint committed): folding rewrites
    * batch history, so a later whole-cycle RETRY of an already-landed
    * batch would see its own rows under batch 0 and (for pinned
    * `batch_id < n` readers like DedupIndex.dedupBatch) mis-derive its
    * survivor set.
    */
  def compact(spark: SparkSession, path: String,
              extraPartitionCols: Seq[String] = Nil): Unit = {
    recoverSwap(spark, path)
    replaceTable(spark.read.parquet(path).drop("batch_id"), path, extraPartitionCols)
  }
}
