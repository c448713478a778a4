package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the Catalyst feature that makes
  * selective shuffle joins cheap at 100 TB: when one join side carries
  * a selective predicate, the optimizer builds a bloom filter over its
  * join keys at runtime and pushes a `might_contain` probe into the
  * OTHER side's scan, so non-matching fact rows die before the shuffle
  * instead of after it. The engine gets this for free BECAUSE the join
  * plans are declarative equi-joins (SURVEY §4) — this spec pins the
  * eligibility so a refactor to a UDF-wrapped key or a non-equi form
  * (which would silently disqualify injection) fails loudly.
  *
  * Thresholds are production-tuned (creation side ≤ 10 MB, application
  * side ≥ 10 GB scanned); test tables sit far under the latter, so the
  * spec lowers it to force the 100 TB decision at test scale.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.01"

  test("selective dim filter injects a bloom probe into the fact-side scan") {
    val s = spark
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevScanThresh =
      s.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    try {
      // no broadcast (at 100 TB neither side fits), and let the test
      // tables' byte size qualify as a "large" application-side scan
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")

      val lineitem = s.read.parquet(s"$d/lineitem.parquet")
      val orders = s.read.parquet(s"$d/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom-filter probe on the fact scan in:\n${plan.take(2000)}")
      // and the probed side must still be the lineitem scan (filter
      // BEFORE the exchange), not a post-shuffle residual
      val probeIdx = plan.indexOf("might_contain")
      val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
      assert(exchangeIdx >= 0 && probeIdx > exchangeIdx,
        "bloom probe should appear under (after, in tree print order) the shuffle")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        prevScanThresh)
    }
  }
}
