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
  * FAILURE CONTRACT (review finding r15 — the reference wraps every
  * probe in try/except and reports `{success: False, message}`,
  * data_pipeline_settings.py:41-47; a health surface that THROWS on the
  * unhealthy component it exists to report is inverted): a provider
  * that dies or a table that fails analysis (missing path, corrupt
  * footer) yields an `ok = false` row carrying the error, never an
  * exception from `testConnections` itself. The guard catches
  * construction/analysis-time failures — the common break (missing or
  * unreadable table dies in schema resolution, which `Tables.table`
  * triggers eagerly); a mid-scan executor failure at ACTION time still
  * surfaces from the consumer's collect, which is unavoidable for a
  * lazily-evaluated union.
  *
  * Each probe is a tiny aggregate; the union stays a single small plan —
  * an admin page query, not a data-path operator.
  */
object HealthProbes {

  private def errRow(spark: SparkSession, component: String, e: Throwable): DataFrame =
    spark.range(1).select(
      lit(component).as("component"),
      lit(false).as("ok"),
      lit(s"error: ${Option(e.getMessage).getOrElse(e.getClass.getName)}".take(200))
        .as("detail"))

  def testConnections(
      spark: SparkSession,
      dir: String,
      provider: EmbeddingProvider = new HashProjectionEmbedder(64)): DataFrame = {
    // driver-side by design: the provider probe is one embed() call,
    // exactly like the reference's test_connection
    val providerRow =
      try {
        val dimOk = provider.embed(Seq("connection probe")).headOption
          .exists(_.length == provider.dimension)
        spark.range(1).select(
          lit("embedding_provider").as("component"),
          lit(dimOk).as("ok"),
          lit(s"dim=${provider.dimension}").as("detail"))
      } catch {
        case scala.util.control.NonFatal(e) => errRow(spark, "embedding_provider", e)
      }
    // limit(1) before the aggregate: non-emptiness needs one row, not a
    // full scan — at 100 TB an admin probe must not read the table
    val tableRows = Seq("documents", "embeddings").map { t =>
      try Tables.table(spark, dir, t).limit(1)
        .agg((count(lit(1)) > 0).as("ok"))
        .select(lit("table:" + t).as("component"), col("ok"),
          lit("readable").as("detail"))
      catch { case scala.util.control.NonFatal(e) => errRow(spark, "table:" + t, e) }
    }
    // This probe is the battery's ONE deliberate table-wide check: the
    // min/max of size(embedding) is a column-pruned scan of the array
    // lengths, not a footer read (the comment above doesn't apply — a
    // computed size has no parquet stats). At 100 TB a deployment reads
    // the dimension from collection METADATA instead (the reference's
    // get_collection_info, and this engine's AnnIndex centroid table);
    // run this form at an audit cadence, not per page view. An EMPTY
    // collection is vacuously uniform — ok = true, never NULL (a null
    // boolean poisons getBoolean consumers and hides from ok = false
    // dashboards alike).
    val collectionRow =
      try Tables.embeddings(spark, dir)
        .agg(coalesce(
          min(size(col("embedding"))) === max(size(col("embedding"))),
          lit(true)).as("ok"))
        .select(lit("collection:embeddings_dim").as("component"), col("ok"),
          lit("uniform_dim").as("detail"))
      catch {
        case scala.util.control.NonFatal(e) => errRow(spark, "collection:embeddings_dim", e)
      }
    (Seq(providerRow) ++ tableRows :+ collectionRow)
      .reduce(_ unionByName _)
  }
}
