package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  // local[8], not local[2]: suites are dominated by many tiny stages
  // (file opens, bin-packed multi-file scans) where cores are pure
  // wall-clock; shuffle.partitions stays 2 so partition-count-sensitive
  // behaviors the specs pin are unchanged.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // multi-path reads (CollectionStore's manifest-resolved range dirs)
    // cross the default 32-path parallel-discovery threshold and spawn
    // a listing JOB per read — pure scheduling latency on local[2].
    // Driver-side listStatus over local tmpfs is faster at any count a
    // spec produces; the production default is untouched.
    .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "2048")
    .appName("graft-test")
    .getOrCreate()
}

class ProvidersSpec extends AnyFunSuite {
  test("HashProjectionEmbedder is deterministic and unit-norm") {
    val e = new HashProjectionEmbedder(64)
    val Seq(a) = e.embed(Seq("the quick brown fox"))
    val Seq(b) = e.embed(Seq("the quick brown fox"))
    assert(a.toSeq == b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(a.length == 64)
  }

  test("embedding is batch-size invariant (order-preserving batching)") {
    val e = new HashProjectionEmbedder(32)
    val texts = (1 to 7).map(i => s"doc number $i words")
    val together = e.embed(texts)
    val singly = texts.map(t => e.embed(Seq(t)).head)
    together.lazyZip(singly).foreach((x, y) => assert(x.toSeq == y.toSeq))
  }

  test("HeadlineContextProvider takes first 8 words of the head") {
    val c = new HeadlineContextProvider
    assert(c.contextFor("one two three four five six seven eight nine", "x")
      == "[ctx] one two three four five six seven eight")
    assert(c.contextFor("   ", "x") == "")
  }

  test("LexicalOverlapReranker scores word-set Jaccard") {
    val r = new LexicalOverlapReranker
    assert(r.score("a b", "a b") == 1.0)
    assert(r.score("a b", "b c") == 1.0 / 3.0)
    assert(r.score("", "a") == 0.0)
  }
}

class IngestPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  private def files() = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "srcA", "en", 120L, ("alpha beta gamma " * 20).trim),  // ~340 chars → 2+ chunks
      (2L, "srcB", "en", 10L, "tiny doc"),
      (3L, "srcC", "en", 0L, "   "),                               // blank → filtered/Failed
      (4L, "srcD", "zh", 30L, "中文 文本 测试 one two")
    ).toDF("doc_id", "source", "lang", "n_chars", "text")
  }

  test("run(): end-to-end rows with embeddings, idempotent point ids") {
    val out = IngestPipeline.run(files()).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Seq[Float]]("embedding").length == 64))
    // blank doc filtered out
    assert(!rows.exists(_.getAs[Long]("source_drive_file") == 3L))
    // deterministic content-addressed ids: re-running yields same ids
    val again = IngestPipeline.run(files()).select("point_id").collect().map(_.getString(0)).sorted
    assert(rows.map(_.getAs[String]("point_id")).sorted.toSeq == again.toSeq)
    // chunk_index dense per doc
    val byDoc = rows.groupBy(_.getAs[Long]("source_drive_file"))
    byDoc.values.foreach { rs =>
      val idx = rs.map(_.getAs[Long]("chunk_index")).sorted
      assert(idx.toSeq == (0L until idx.length).toSeq)
      assert(rs.forall(_.getAs[Long]("total_chunks") == rs.length))
    }
  }

  test("payload truncation caps text at the configured limit") {
    val out = IngestPipeline.run(files()).collect()
    assert(out.forall(r => r.getAs[String]("text").length <= 1000))
    assert(out.forall(r => r.getAs[String]("original_text").nonEmpty))
  }

  test("ledger marks blank docs Failed with reason") {
    val l = IngestPipeline.ledger(files()).collect()
      .map(r => r.getAs[Long]("source_drive_file") ->
        (r.getAs[String]("status"), r.getAs[String]("error_message"))).toMap
    assert(l(3L) == (("Failed", "empty document")))
    assert(l(1L)._1 == "Completed" && l(1L)._2 == null)
  }

  test("K1 sink: partitioned parquet layout round-trips with partition pruning") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-k1").toString
    IngestPipeline.run(files())
      .write.partitionBy("source_title").mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    assert(back.count() == IngestPipeline.run(files()).count())
    // partition filter prunes directories (scan shows partition count 1)
    val pruned = back.filter(col("source_title") === "srcB")
    assert(pruned.select("source_drive_file").distinct().collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("cascadeDelete removes exactly the target file's points") {
    val s = spark
    import s.implicits._
    val points = IngestPipeline.run(files())
    val survivors = IngestPipeline.cascadeDelete(
      points, Seq(java.lang.Long.valueOf(1L)).toDS()).collect()
    assert(!survivors.exists(_.getAs[Long]("source_drive_file") == 1L))
    assert(survivors.exists(_.getAs[Long]("source_drive_file") == 2L))
  }
}
