package graft.search

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SearchServiceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fixture() = {
    val s = spark
    import s.implicits._
    graft.expressions.GraftFunctions.register(s)
    // vec 0 = query; vec 1 ≈ query; vec 2 orthogonal; vec 3 ≈ query but RLS-hidden
    Seq(
      (0L, Array(1f, 0f, 0f, 0f), "q text words", "A"),
      (1L, Array(0.9f, 0.1f, 0f, 0f), "q text overlap", "A"),
      (2L, Array(0f, 1f, 0f, 0f), "unrelated body", "B"),
      (3L, Array(0.95f, 0.05f, 0f, 0f), "hidden doc", "A")
    ).toDF("vec_id", "embedding", "text", "label")
  }

  test("RLS composes BEFORE top-k: hidden high-scorer never surfaces") {
    val s = spark
    import s.implicits._
    val v = fixture()
    val accessible = Seq(0L, 1L, 2L).toDF("id")
    val query = v.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("text").as("q_text"))
    val out = SearchService.search(v, accessible, query, k = 2, overFetch = 2,
      excludeId = Some(0L)).collect()
    val ids = out.map(_.getAs[Long]("vec_id")).toSet
    assert(!ids.contains(3L), "RLS-hidden doc leaked into results")
    assert(!ids.contains(0L), "self was not excluded")
    assert(ids.contains(1L))
  }

  test("RLS admin bypass: Administrator / System Manager see the unfiltered relation") {
    val s = spark
    import s.implicits._
    val v = fixture()
    val accessible = Seq(0L, 1L, 2L).toDF("id") // 3 is hidden for non-admins
    // permissions.py:19-21 / 53-55 — either role gets the empty condition
    for (role <- Seq("Administrator", "System Manager")) {
      val gated = SearchService.rlsFilter(v, accessible, roles = Seq(role, "Desk User"))
      assert(gated.count() === 4L, s"$role should bypass RLS entirely")
      // the bypass must REMOVE the semi-join from the plan, not just widen the id set
      assert(!gated.queryExecution.optimizedPlan.toString.toLowerCase.contains("join"),
        s"$role path still plans the semi-join")
    }
    // a non-admin role list still takes the semi-join
    val nonAdmin = SearchService.rlsFilter(v, accessible, roles = Seq("Desk User"))
    assert(nonAdmin.count() === 3L)
    assert(nonAdmin.select("vec_id").as[Long].collect().toSet === Set(0L, 1L, 2L))
  }

  test("search with admin role surfaces the RLS-hidden high-scorer") {
    val s = spark
    import s.implicits._
    val v = fixture()
    val accessible = Seq(0L, 1L, 2L).toDF("id")
    val query = v.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("text").as("q_text"))
    val admin = SearchService.search(v, accessible, query, k = 3, excludeId = Some(0L),
      roles = Seq("System Manager")).collect()
    assert(admin.map(_.getAs[Long]("vec_id")).toSet.contains(3L),
      "admin search should see the doc non-admins cannot")
    val user = SearchService.search(v, accessible, query, k = 3, excludeId = Some(0L),
      roles = Seq("Desk User")).collect()
    assert(!user.map(_.getAs[Long]("vec_id")).toSet.contains(3L))
  }

  test("denseTopK orders by cosine desc with id tiebreak") {
    val s = spark
    import s.implicits._
    val v = fixture()
    val query = v.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val out = SearchService.denseTopK(v, query, k = 3, excludeId = Some(0L)).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(3L, 1L, 2L))
  }

  test("external batch reranker path == inline codegen path on the lexical scorer") {
    val s = spark
    import s.implicits._
    val v = fixture()
    val accessible = Seq(0L, 1L, 2L, 3L).toDF("id")
    val qText = "q text words"
    val query = v.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), lit(qText).as("q_text"))
    // the inline expression rounds to 6dp before ordering — lift a
    // scorer with the same rounding so tie-breaks agree exactly
    val rounded = new graft.pipeline.Reranker {
      private val inner = new graft.pipeline.LexicalOverlapReranker
      def score(q: String, t: String): Double =
        math.floor(inner.score(q, t) * 1e6 + 0.5) / 1e6
    }
    val inline = SearchService.search(v, accessible, query, k = 3, overFetch = 2,
      excludeId = Some(0L)).collect()
    val external = SearchService.searchWithBatchReranker(v, accessible, query, qText,
      new graft.pipeline.PairwiseBatchReranker(rounded), k = 3, overFetch = 2,
      excludeId = Some(0L)).collect()
    assert(external.map(_.getAs[Long]("vec_id")).toSeq
      == inline.map(_.getAs[Long]("vec_id")).toSeq)
    assert(external.map(_.getAs[Double]("rerank_score")).toSeq
      == inline.map(_.getAs[Double]("rerank_score")).toSeq)
    assert(external.map(_.getAs[Long]("rerank_rank")).toSeq == Seq(0L, 1L, 2L))
  }

  test("reranker failure falls back to the dense top-k in original order") {
    val s = spark
    import s.implicits._
    val v = fixture()
    val accessible = Seq(0L, 1L, 2L, 3L).toDF("id")
    val query = v.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), lit("q").as("q_text"))
    val broken = new graft.pipeline.BatchReranker {
      def rerank(q: String, docs: Seq[String], topN: Int): Seq[(Int, Double)] =
        throw new java.io.IOException("HTTP 503")
    }
    val out = SearchService.searchWithBatchReranker(v, accessible, query, "q",
      broken, k = 2, overFetch = 2, excludeId = Some(0L)).collect()
    // reference parity (search_service.py:304-316): results[:top_k],
    // vector order, scores null
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(3L, 1L))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("rerank_score"))))
  }

  test("findSimilarChunks: anchor retrieved by id, self-skipped, k+1 quirk preserved") {
    val s = spark
    import s.implicits._
    val v = fixture().withColumnRenamed("label", "source_document")
    // anchor 0 ("A"); nearest are 3 (A), 1 (A), 2 (B)
    val plain = SearchService.findSimilarChunks(v, chunkId = 0L, k = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(plain == Seq(3L, 1L), s"got $plain")
    // cross-doc-only runs on the k+1 SLIVER (reference parity:
    // search_service.py:195-210 filters after the limit): k=2 fetches
    // {0,3,1}, drops self + same-doc A-rows → UNDER-FILLS to 0 rows
    // even though doc-B vec 2 exists in the corpus
    val crossDoc = SearchService.findSimilarChunks(v, chunkId = 0L, k = 2,
      excludeSameDocument = true).collect()
    assert(crossDoc.isEmpty,
      "k+1 over-fetch quirk lost: same-doc filter must run on the limited sliver")
    // a wider k reaches the other document
    val wide = SearchService.findSimilarChunks(v, chunkId = 0L, k = 3,
      excludeSameDocument = true).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(wide == Seq(2L))
    // unknown anchor id → empty relation, not an error (:186-187)
    assert(SearchService.findSimilarChunks(v, chunkId = 99L, k = 2).collect().isEmpty)
  }

  test("findSimilarChunks method == the oracled v2_similar_chunks composition") {
    val s = spark
    import s.implicits._
    val v = fixture()
    import graft.functions.VectorOps
    // inline twin of the method's contract: top-(k+1) by rankedCosine,
    // skip self, drop same-doc, take k
    val anchor = v.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("label").as("q_doc"))
    val inline = v.crossJoin(broadcast(anchor))
      .withColumn("score", VectorOps.rankedCosine(col("embedding"), col("qv")))
      .orderBy(col("score").desc, col("vec_id")).limit(3)
      .filter(col("vec_id") =!= 0 && col("label") =!= col("q_doc"))
      .orderBy(col("score").desc, col("vec_id")).limit(2)
      .select("vec_id").as[Long].collect().toSeq
    val method = SearchService.findSimilarChunks(v, chunkId = 0L, k = 2,
      excludeSameDocument = true, docCol = "label")
      .select("vec_id").as[Long].collect().toSeq
    assert(method == inline)
  }

  test("searchByDocument filters to the document BEFORE the dense scan") {
    val s = spark
    import s.implicits._
    val v = fixture().withColumn("source_document",
      when(col("vec_id") === 2L, "docB").otherwise("docA"))
    val accessible = Seq(0L, 1L, 2L, 3L).toDF("id")
    val query = v.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("text").as("q_text"))
    val inA = SearchService.searchByDocument(v, accessible, query, lit("docA"), k = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(inA.subsetOf(Set(0L, 1L, 3L)) && inA.nonEmpty,
      s"docA search leaked other documents: $inA")
    val inB = SearchService.searchByDocument(v, accessible, query, lit("docB"), k = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(inB == Set(2L))
  }

  test("lexicalOverlap matches the provider trait implementation") {
    val s = spark
    import s.implicits._
    val rr = new graft.pipeline.LexicalOverlapReranker
    val cases = Seq(("a b c", "a b c"), ("a b", "b c"), ("x", "y"), ("", "a"))
    val df = cases.toDF("qa", "tb")
      .select(SearchService.lexicalOverlap(col("qa"), col("tb")).as("j"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    val want = cases.map { case (a, b) => rr.score(a, b) }
    got.lazyZip(want).foreach((g, w) => assert(math.abs(g - w) < 1e-12, s"$g != $w"))
  }
}
