package graft.operators

import graft.Tables
import graft.functions.TextOps
import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Tiling invariants of the sequence-pack manifest that the hash oracle
  * can't state: pieces reconstruct every document exactly, every window
  * except the last is completely full, and pieces tile each window
  * contiguously with no gaps or overlaps.
  */
class SequencePackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("pieces tile documents and windows exactly") {
    val rows = graft.SparkEntry.queries("sequence_pack")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 >= 1))
    // per doc: pieces sum to the doc's token count
    val nTok = Tables.documents(spark, d)
      .select(col("doc_id"), TextOps.wordCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (doc, ps) =>
      assert(ps.map(_._4).sum == nTok(doc), s"doc $doc pieces != token count")
    }
    // docs spanning a window boundary must exist, else the chop path
    // was never exercised
    assert(rows.groupBy(_._1).exists(_._2.length > 1))
    // per window: full (256) except the last, and pieces tile [0, fill)
    val lastSeq = rows.map(_._2).max
    rows.groupBy(_._2).foreach { case (seq, ps) =>
      val fill = ps.map(_._4).sum
      if (seq < lastSeq) assert(fill == 256L, s"window $seq fill=$fill")
      else assert(fill <= 256L, s"last window $seq overfull: $fill")
      val sorted = ps.sortBy(_._3)
      var expect = 0L
      sorted.foreach { case (doc, _, off, n) =>
        assert(off == expect, s"window $seq: doc $doc starts at $off, expected $expect")
        expect = off + n
      }
    }
  }
}
