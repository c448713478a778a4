package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SQL-expressible operator from SURVEY.md §2 has an entry in
  * [[queries]] and a DuckDB oracle in [[oracleSql]]; non-SQL-expressible
  * operators (pure-Scala chunkers, stubbed external providers, ANN paths)
  * have `queries` entries only (rows-only check) plus ScalaTest specs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's ingestion path (SURVEY.md §3.1) in batch form:
    * scan → ingest filters (F1/F2/F10) → chunk generator (G1 fixed form)
    * → per-chunk projections (P15/P16) → deterministic point ids (T6).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    graft.pipeline.IngestPipeline.run(Tables.documents(spark, dir))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      VectorQueries.queries ++
      PipelineQueries.queries ++
      AnnQueries.queries ++
      MultimodalQueries.queries ++
      CurationQueries.queries ++
      SketchQueries.queries ++
      DriftQueries.queries ++
      SourceQueries.queries ++
      EditDistanceQueries.queries ++
      GovernanceQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      VectorQueries.oracles ++
      PipelineQueries.oracles ++
      AnnQueries.oracles ++
      MultimodalQueries.oracles ++
      CurationQueries.oracles ++
      SketchQueries.oracles ++
      DriftQueries.oracles ++
      SourceQueries.oracles ++
      EditDistanceQueries.oracles ++
      GovernanceQueries.oracles
}
