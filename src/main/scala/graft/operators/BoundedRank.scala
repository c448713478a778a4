package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-by-join for BOUNDED relations (post-`limit(k)` top-k lists).
  *
  * `row_number().over(Window.orderBy(...))` on a global list needs an
  * empty partition spec, which WindowExec executes on one partition and
  * warns about on every run — and Spark 4's `EliminateWindowPartitions`
  * optimizer rule folds a constant `partitionBy(lit(0))` right back to
  * the empty spec, so the classic silencing trick no longer works. For a
  * list already reduced to ≤k rows the rank is just a count: rows whose
  * sort key is ≤ mine. A broadcast self-join computes that with no
  * single-partition window, no warning, and O(k²) comparisons on a
  * k≤100 relation — noise at any scale, because the bound comes from the
  * preceding `limit`, not the corpus.
  */
object BoundedRank {

  /** Append `rankName` = 1-based rank of each row under the ascending
    * total order `key` (encode descending fields by negation inside the
    * struct). `key` must be duplicate-free — callers tie-break with a
    * unique id, which is also what makes the rank deterministic.
    */
  def withRank(df: DataFrame, rankName: String, key: Column): DataFrame = {
    // Pin the bounded list first: both sides of the rank self-join read
    // it, and without materialization Catalyst plans the (potentially
    // corpus-sized) upstream subtree once PER SIDE — measured +0.4 s on
    // hybrid_bm25_rrf's BM25 scoring at sf0.1. Checkpointing ≤k rows is
    // microseconds and makes the self-join read the tiny relation twice
    // instead of recomputing its lineage twice.
    val pinned = df.localCheckpoint()
    val keyed = pinned.withColumn("__brk", key)
    val keys = keyed.select(col("__brk").as("__brk_other"))
    keyed
      .join(broadcast(keys), col("__brk_other") <= col("__brk"))
      .groupBy(keyed.columns.map(col).toSeq: _*)
      .agg(count(lit(1)).cast("int").as(rankName))
      .drop("__brk")
  }
}
