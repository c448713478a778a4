package graft

import org.apache.spark.sql.DataFrame
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
}
