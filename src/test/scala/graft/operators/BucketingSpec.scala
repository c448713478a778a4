package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing — the shuffle-elimination tool for repeated co-located
  * joins (SURVEY §7 scale notes): both sides written `bucketBy` on the
  * join key join WITHOUT an Exchange on either side. This is how the
  * points↔files enrichment (J1) runs at 100 TB when both tables are
  * owned by the engine: pay the partitioning once at write time, never
  * at query time.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed tables join with zero shuffle exchanges") {
    val s = spark
    import s.implicits._
    val left = (0L until 1000L).map(i => (i, s"file$i")).toDF("file_id", "title")
    val right = (0L until 5000L).map(i => (i % 1000L, s"chunk$i")).toDF("file_id", "chunk")

    s.sql("DROP TABLE IF EXISTS b_files")
    s.sql("DROP TABLE IF EXISTS b_chunks")
    // a fresh session's metastore no longer knows the tables, but their
    // warehouse directories survive — remove them or CTAS refuses
    val wh = new java.io.File(s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("b_files", "b_chunks").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    left.write.mode("overwrite").bucketBy(8, "file_id").sortBy("file_id")
      .saveAsTable("b_files")
    right.write.mode("overwrite").bucketBy(8, "file_id").sortBy("file_id")
      .saveAsTable("b_chunks")

    // disable broadcast so the co-located SortMergeJoin path is what we
    // measure (with broadcast on, Spark rightly prefers it for a table
    // this small — at 100 TB neither side broadcasts)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("b_chunks").join(s.table("b_files"), "file_id")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: SortMergeJoin directly over the bucketed scans — no
      // shuffle exchange on either input
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used in:\n$plan")
      assert(joined.count() == 5000)

      // and an aggregation on the bucket key also skips the shuffle
      val agg = s.table("b_chunks").groupBy("file_id").agg(count(lit(1)))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$aggPlan")
      assert(agg.count() == 1000)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
