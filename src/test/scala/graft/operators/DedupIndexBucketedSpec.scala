package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed dedup-index layout: each increment's anti/semi probes must
  * satisfy their distribution requirement from the bucketed index files
  * — the index-side shuffle that the plain parquet layout pays per
  * batch disappears, leaving only the (tiny) incoming side to exchange.
  * Asserted comparatively: same joins, same data, bucketed plan carries
  * strictly fewer hash exchanges; outputs identical.
  */
class DedupIndexBucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(ids: Range, salt: String) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"doc $salt $i content word$i tail")).toDF("doc_id", "text")
  }

  test("bucketed index drops the index-side exchange; output parity with plain path") {
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // expose the shuffle shape
    try {
      Seq("dbk_fp", "dbk_bands").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val wh = new java.io.File(s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
        val dir = new java.io.File(wh, t)
        if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
      }
      val batch0 = docs(0 until 40, "a")
      val batch1 = docs(40 until 80, "b")
      DedupIndex.acceptBucketed(batch0, "dbk_fp", "dbk_bands")
      DedupIndex.acceptBucketed(batch1, "dbk_fp", "dbk_bands") // append path
      // incoming: 10 exact dupes of batch0 + 10 fresh docs
      val incoming = docs(0 until 10, "a").union(docs(100 until 110, "c"))

      val bucketed = DedupIndex.dedupBatchBucketed(s, "dbk_fp", "dbk_bands", incoming)
      val existing = batch0.union(batch1)
      val plain = DedupIndex.dedupAgainst(incoming,
        DedupIndex.fingerprints(existing), DedupIndex.bandRows(existing))

      val bOut = bucketed.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      val pOut = plain.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      assert(bOut == pOut, s"bucketed=$bOut plain=$pOut")
      assert(bOut == (100L until 110L), "exact dupes must be rejected, fresh docs kept")

      def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect() // settle AQE
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      }
      val nBucketed = exchanges(DedupIndex.dedupBatchBucketed(s, "dbk_fp", "dbk_bands", incoming))
      val nPlain = exchanges(DedupIndex.dedupAgainst(incoming,
        DedupIndex.fingerprints(existing), DedupIndex.bandRows(existing)))
      assert(nBucketed < nPlain,
        s"bucketed layout should shed index-side exchanges: bucketed=$nBucketed plain=$nPlain")
      // and the bucketed scans really are bucketed
      val planStr = DedupIndex.dedupBatchBucketed(s, "dbk_fp", "dbk_bands", incoming)
        .queryExecution.executedPlan.toString
      assert(planStr.contains("Bucketed: true"), planStr.take(1500))
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS dbk_fp")
      s.sql("DROP TABLE IF EXISTS dbk_bands")
    }
  }
}
