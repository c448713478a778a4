package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing — the 100 TB pattern for repeated
  * large-large joins on a stable key (SURVEY.md §7 scale notes): bucket
  * both sides by the join key at write time; the join then runs with NO
  * shuffle exchange on either side.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed tables join without a shuffle exchange") {
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val left = (1L to 1000L).map(i => (i, s"file_$i")).toDF("file_id", "title")
      val right = (1L to 3000L).map(i => (i % 1000 + 1, s"chunk_$i")).toDF("file_id", "chunk")
      left.write.mode("overwrite").bucketBy(8, "file_id").sortBy("file_id")
        .saveAsTable("bk_files")
      right.write.mode("overwrite").bucketBy(8, "file_id").sortBy("file_id")
        .saveAsTable("bk_chunks")
      val joined = s.table("bk_files").join(s.table("bk_chunks"), "file_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 3000L)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS bk_files")
      s.sql("DROP TABLE IF EXISTS bk_chunks")
    }
  }
}
