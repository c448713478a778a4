package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Admin health surface — the reference's `test_connection` battery
  * (data_pipeline_settings.py:29-114 probes the embedding provider,
  * Qdrant and storage; embedding_service.py:123-142, qdrant_service.py:
  * 223-238 implement the per-provider checks). Here the probes return
  * ONE status DataFrame instead of mutating a settings doc:
  *
  *  - `embedding_provider`: the provider round-trips a probe string and
  *    its output width matches its declared dimension (the reference's
  *    embed-"test"-and-check-dim probe)
  *  - `table:<name>`: the backing table is readable and non-empty
  *  - `collection:embeddings_dim`: every stored vector has the same
  *    width (the K4 collection-info invariant a dimension-mismatched
  *    upsert would break)
  *
  * Each probe is a tiny aggregate; the union stays a single small plan —
  * an admin page query, not a data-path operator.
  */
object HealthProbes {

  def testConnections(
      spark: SparkSession,
      dir: String,
      provider: EmbeddingProvider = new HashProjectionEmbedder(64)): DataFrame = {
    // driver-side by design: the provider probe is one embed() call,
    // exactly like the reference's test_connection
    val dimOk = provider.embed(Seq("connection probe")).headOption
      .exists(_.length == provider.dimension)
    val providerRow = spark.range(1).select(
      lit("embedding_provider").as("component"),
      lit(dimOk).as("ok"),
      lit(s"dim=${provider.dimension}").as("detail"))
    // limit(1) before the aggregate: non-emptiness needs one row, not a
    // full scan — at 100 TB an admin probe must not read the table
    val tableRows = Seq("documents", "embeddings").map { t =>
      Tables.table(spark, dir, t).limit(1)
        .agg((count(lit(1)) > 0).as("ok"))
        .select(lit("table:" + t).as("component"), col("ok"),
          lit("readable").as("detail"))
    }
    val collectionRow = Tables.embeddings(spark, dir)
      .agg((min(size(col("embedding"))) === max(size(col("embedding")))).as("ok"))
      .select(lit("collection:embeddings_dim").as("component"), col("ok"),
        lit("uniform_dim").as("detail"))
    (Seq(providerRow) ++ tableRows :+ collectionRow)
      .reduce(_ unionByName _)
  }
}
