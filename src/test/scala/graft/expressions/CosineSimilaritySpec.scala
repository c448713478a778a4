package graft.expressions

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vectors() = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 50).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() * 2 - 1)))
    }.toDF("id", "v")
  }

  test("codegen expression equals the fold-built cosine bit-for-bit") {
    GraftFunctions.register(spark)
    val df = vectors()
    val a = df.select(col("id").as("ia"), col("v").as("va"))
    val b = df.select(col("id").as("ib"), col("v").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val both = pairs.select(
      graft.functions.VectorOps.cosine(col("va"), col("vb")).as("fast"),
      graft.functions.VectorOps.cosineViaFolds(col("va"), col("vb")).as("ref"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("self-similarity is 1.0 within float tolerance; range bounded") {
    GraftFunctions.register(spark)
    val df = vectors()
    val selfs = df.select(graft.functions.VectorOps.cosine(col("v"), col("v")).as("c")).collect()
    selfs.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("expression survives wholestage codegen (plan contains it, no fallback error)") {
    GraftFunctions.register(spark)
    val df = vectors()
    val out = df.select(sum(graft.functions.VectorOps.cosine(col("v"), col("v"))).as("s"))
    assert(math.abs(out.collect()(0).getDouble(0) - 50.0) < 1e-9)
  }
}
