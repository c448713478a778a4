package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of SemDeDup that the hash oracle can't state:
  * tau bounds the decision from both ends, and the keep rule really is
  * "lowest centroid cosine (ties to smaller id) outranks" — verified
  * against a driver-side brute-force recompute of the within-cell pair
  * space on the small corpus.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def run(tau: Double) =
    AnnQueries.semDedup(Tables.embeddings(spark, d), tau = tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))

  test("tau above the cosine range keeps everything") {
    val rows = run(tau = 1.5)
    assert(rows.length == 500)
    assert(rows.forall(_._4))
  }

  test("tau below the cosine range keeps exactly one member per cell — the (c_cos, id) minimum") {
    val rows = run(tau = -1.5)
    val byCell = rows.groupBy(_._2)
    byCell.foreach { case (cell, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, s"cell $cell kept ${kept.length} members")
      val expect = members.minBy(m => (m._3, m._1))
      assert(kept.head._1 == expect._1,
        s"cell $cell kept ${kept.head._1}, expected (c_cos,id)-min ${expect._1}")
    }
  }

  test("default-tau decisions match a brute-force within-cell recompute") {
    val rows = run(tau = 0.3)
    val emb = Tables.embeddings(spark, d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCell = rows.groupBy(_._2)
    var droppedTotal = 0
    byCell.foreach { case (cell, members) =>
      members.foreach { case (id, _, cc, kept) =>
        val hasWitness = members.exists { case (oid, _, occ, _) =>
          oid != id && (occ < cc || (occ == cc && oid < id)) &&
            cos6(emb(oid), emb(id)) >= 0.3
        }
        assert(kept == !hasWitness,
          s"cell $cell vec $id: kept=$kept but witness-exists=$hasWitness")
        if (!kept) droppedTotal += 1
      }
    }
    // the corpus ships planted near-dups — the prune must actually fire
    assert(droppedTotal > 0, "no vector was dropped at tau=0.3")
  }

  test("incremental decisions match batch-vs-kept-index brute force") {
    val e = Tables.embeddings(spark, d)
    val cents = AnnIndex.centroids(e)
    // the stored index side: kept existing members with their cells
    val keptX = AnnQueries.semDedupWithCents(
        e.filter(org.apache.spark.sql.functions.col("vec_id") % 5 =!= 0), cents, 0.3)
      .collect()
      .filter(_.getAs[Boolean]("kept"))
      .map(r => (r.getAs[Long]("cell"), r.getAs[Seq[Float]]("embedding").toArray))
    val inc = graft.SparkEntry.queries("semdedup_incremental")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(inc.length == 100) // vec_id % 5 == 0 slice of the 500-row corpus
    val emb = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var dropped = 0
    inc.foreach { case (id, cell, kept) =>
      val hasWitness = keptX.exists { case (xc, xe) =>
        xc == cell && cos6(xe, emb(id)) >= 0.3
      }
      assert(kept == !hasWitness, s"incoming $id: kept=$kept, witness=$hasWitness")
      if (!kept) dropped += 1
    }
    assert(dropped > 0, "no incoming vector was pruned against the index")
  }
}
