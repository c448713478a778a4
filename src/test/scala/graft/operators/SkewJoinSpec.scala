package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting — the runtime defense for hot join keys at
  * 100 TB (a single key holding 1% of the corpus lands 1 TB on one
  * task without it). `skew_salted_agg` pins the MANUAL salting answer
  * for aggregations; this spec pins that the engine's join shapes stay
  * eligible for the AUTOMATIC one: AQE detects an oversized shuffle
  * partition on a sort-merge join and splits it across tasks
  * (duplicating the matching build rows) with no query rewrite.
  * Eligibility is load-bearing: a custom partitioner, a pre-sorted
  * output requirement, or a non-equi form would silently disqualify
  * the rewrite and the hot key would again serialize on one task.
  *
  * Production thresholds (256 MB partitions) are forced down so a
  * test-scale hot key makes the same decision a 100 TB one would.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AQE splits a hot-key shuffle partition in a sort-merge join") {
    val s = spark
    import s.implicits._
    val confKeys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.shuffle.partitions")
    val prev = confKeys.map(k => k -> s.conf.get(k)).toMap
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // a partition is "skewed" when > factor × median AND > threshold;
      // force both low enough that the hot key trips at test scale
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // skew detection compares against the MEDIAN partition size —
      // with the test session's tiny partition count the hot partition
      // IS the median and can never be 2× itself; give the median
      // enough healthy partitions to reflect the non-skewed population
      s.conf.set("spark.sql.shuffle.partitions", "16")

      // 100k fact rows: 90% on key 7 (the hot key), the rest spread.
      // The payload column must SURVIVE the join output — otherwise
      // column pruning shuffles bare keys and the hot partition
      // compresses below any realistic skew threshold.
      val fact = s.range(100000L)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000L).as("k"),
          concat(lit("payload-padding-padding-padding-"), col("id")).as("v"))
      val dim = (0L until 1000L).map(i => (i, s"dim$i")).toDF("k", "name")

      val joined = fact.join(dim, "k")
        .groupBy("name").agg(count(lit(1)).as("n"), max(col("v")).as("mv"))
      joined.collect() // AQE decides at runtime — materialize first
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle join in:\n${plan.take(1500)}")
      // AQE marks the rewritten join isSkewJoin=true and the shuffle
      // read shows the split ("skewed" in AQEShuffleRead)
      assert(plan.contains("skew"), s"expected a skew-split marker in:\n${plan.take(2000)}")
    } finally prev.foreach { case (k, v) => s.conf.set(k, v) }
  }
}
