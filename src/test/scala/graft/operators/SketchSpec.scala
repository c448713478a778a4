package graft.operators

import graft.functions.KmvAggregator
import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Sketch operators (SketchQueries): the properties that make a sketch a
  * sketch — monoid folds are lossless (partition invariance), estimates
  * sit inside their published bounds, CMS never undercounts.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("KmvAggregator is a monoid: merge of splits == whole, distinct, sorted, capped") {
    val K = KmvAggregator.K
    val values = (1 to 500).map(i => ((i * 2654435761L) % 100000) + 1) // dups included
    val whole = values.foldLeft(KmvAggregator.zero)(KmvAggregator.reduce)
    // every split point must fold to the identical sketch
    Seq(1, 7, 250, 499).foreach { cut =>
      val (a, b) = values.splitAt(cut)
      val merged = KmvAggregator.merge(
        a.foldLeft(KmvAggregator.zero)(KmvAggregator.reduce),
        b.foldLeft(KmvAggregator.zero)(KmvAggregator.reduce))
      assert(merged.toSeq == whole.toSeq, s"split at $cut diverges")
    }
    assert(whole.length == math.min(K, values.distinct.length))
    assert(whole.toSeq == whole.toSeq.distinct.sorted)
    assert(whole.toSeq == values.distinct.sorted.take(K), "kept set is the K smallest distinct")
  }

  test("distinct_kmv: estimate within the KMV error bound, exact below K") {
    val rows = SketchQueries.queries("distinct_kmv")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nKept, est, exact) = (r.getAs[Int]("n_kept"), r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
      if (nKept < KmvAggregator.K) assert(est == exact, s"${r.getAs[String]("source")}: sub-K sketch must be exact")
      else {
        // relative error of the KMV estimator is ~1/sqrt(K-2); allow 4 sigma
        val sigma = 1.0 / math.sqrt(KmvAggregator.K - 2)
        assert(math.abs(est - exact).toDouble / exact <= 4 * sigma,
          s"${r.getAs[String]("source")}: est $est vs exact $exact outside 4σ")
      }
    }
  }

  test("distinct_kmv is partition-invariant (the monoid property end to end)") {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.documents(spark, d)
    def run(parts: Int) = {
      val shingled = base.repartition(parts)
        .select(col("source"), explode(graft.functions.TextOps.shingles3Udf(col("text"))).as("sh"))
      SketchQueries.kmvSketch(shingled)
        .orderBy("source").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    }
    assert(run(1).toSeq == run(13).toSeq)
  }

  test("kmvSketch plan: the only exchange is sketch-sized, keyed on source") {
    import org.apache.spark.sql.functions._
    val shingled = graft.Tables.documents(spark, d)
      .select(col("source"), explode(graft.functions.TextOps.shingles3Udf(col("text"))).as("sh"))
    val plan = SketchQueries.kmvSketch(shingled).queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.length == 1, s"expected exactly one exchange:\n$plan")
    assert(exchanges.head.contains("hashpartitioning(source"), s"exchange not source-keyed:\n$plan")
    assert(!exchanges.head.contains("sh#"),
      s"the corpus shingle column leaked into the exchange key — the sketch is shuffling the corpus:\n$plan")
  }

  test("DistinctSketch: stored fold == one-pass, retry no-op, compaction-invariant") {
    import org.apache.spark.sql.functions._
    import TableAssertions.assertSameTable
    val dir = java.nio.file.Files.createTempDirectory("graft-distinct-sketch").toString
    val docs = graft.Tables.documents(spark, d)
    DistinctSketch.init(docs.filter(col("doc_id") % 3 === 0), dir)
    DistinctSketch.addBatch(docs.filter(col("doc_id") % 3 === 1), dir, 1L)
    DistinctSketch.addBatch(docs.filter(col("doc_id") % 3 === 2), dir, 2L)

    // the monoid law end to end: per-batch sketches folded at read time
    // == the one-pass corpus sketch == the inline query's estimate side
    val inline = SketchQueries.queries("distinct_kmv")(spark, d)
      .drop("exact_distinct")
    assertSameTable(DistinctSketch.estimate(spark, dir), inline,
      "stored estimate vs inline query")

    // crash-retry: re-landing a batch is a no-op (idempotent monoid)
    DistinctSketch.addBatch(docs.filter(col("doc_id") % 3 === 1), dir, 1L)
    assertSameTable(DistinctSketch.estimate(spark, dir), inline, "re-added batch is a no-op")

    // compaction folds batch partitions without changing any answer
    graft.BatchSink.compact(spark, dir)
    assertSameTable(DistinctSketch.estimate(spark, dir), inline, "estimate after compaction")
  }

  test("heavy_hitters_cms never undercounts and is exact in collision-free cells") {
    val rows = SketchQueries.queries("heavy_hitters_cms")(spark, d).collect()
    assert(rows.length > 0 && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"${r.getAs[String]("tok")}: CMS undercounted — structurally impossible, hash drift")
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"))
    }
  }

  test("length_quantiles: estimate brackets the exact rank statistic within one bin") {
    val rows = SketchQueries.queries("length_quantiles")(spark, d).collect()
    assert(rows.length >= 3, "at least one source × three quantiles")
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("overflow"), "corpus docs are short — no overflow expected here")
      val (est, exact) = (r.getAs[Long]("est_upper"), r.getAs[Long]("exact_value"))
      assert(est > exact && est - exact <= 8,
        s"${r.getAs[String]("source")} q=${r.getAs[Long]("q")}: est $est vs exact $exact " +
          "outside the (0, binWidth] bracket — the histogram bound is broken")
    }
    // quantiles are monotone in q within a source
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val byQ = rs.sortBy(_.getAs[Long]("q")).map(_.getAs[Long]("est_upper"))
      assert(byQ.sameElements(byQ.sorted), s"$src: quantile estimates not monotone in q")
    }
  }

  test("length_quantiles: the open-ended top bin reports overflow, never a capped number") {
    val s = spark
    import s.implicits._
    // 600-word docs land beyond bin 63 (binWidth 8 × 64 bins = 512)
    val long = Seq.tabulate(4)(i =>
      (i.toLong, Seq.fill(600)("w").mkString(" "), "en", "long")).toDF("doc_id", "text", "lang", "source")
    val out = SketchQueries.lengthQuantiles(long).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("overflow"), "600-word docs must land in the overflow bin")
      assert(r.isNullAt(r.fieldIndex("est_upper")),
        "overflow must report NULL, not a silently capped 512 (the review finding)")
      assert(r.getAs[Long]("exact_value") == 600L)
    }
  }

  test("token_entropy: uniform distribution hits ln(vocab), degenerate source is 0/null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // reuse the operator body via a temp view over crafted docs
    val docs = Seq(
      (1L, "a b c d a b c d", "uniform", "uniform"), // 4 types × 2 — uniform
      (2L, "x x x x", "flat", "flat") // single type: entropy 0, norm null
    ).toDF("doc_id", "text", "lang", "source")
    val c = docs.select(col("source"), explode(graft.functions.TextOps.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val h = log(col("n_tokens").cast("double")) - col("sclc") / col("n_tokens").cast("double")
    val out = c.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("sclc"))
      .select(col("source"), col("vocab"), round(h, 6).as("entropy"),
        when(col("vocab") > 1, round(h / log(col("vocab").cast("double")), 6)).as("norm_entropy"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("uniform").getAs[Double]("entropy") == math.floor(math.log(4) * 1e6 + 0.5) / 1e6 ||
      math.abs(out("uniform").getAs[Double]("entropy") - math.log(4)) < 1e-6)
    assert(math.abs(out("uniform").getAs[Double]("norm_entropy") - 1.0) < 1e-6)
    assert(out("flat").getAs[Double]("entropy") == 0.0)
    assert(out("flat").isNullAt(out("flat").fieldIndex("norm_entropy")))
  }
}
