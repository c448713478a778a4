package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed Dataset surface for the pipeline's row shapes (SURVEY.md §1.4:
  * case classes mirroring the reference's dataclasses, compile-time
  * safety where it helps; `DataFrame` remains the dynamic-schema view).
  */
object Typed {

  /** Mirror of the reference's SemanticChunk + payload columns
    * (services/chunking_service.py:13-20 → K1 payload,
    * tasks/process_embedding.py:387-399).
    */
  final case class PointRecord(
      point_id: String,
      embedding: Seq[Float],
      source_drive_file: Long,
      source_title: String,
      chunk_index: Long,
      total_chunks: Long,
      text: String,
      original_text: String,
      context_prefix: String,
      detected_languages: String)

  /** Mirror of the Embedding Job ledger row (embedding_job.json). */
  final case class LedgerRecord(
      source_drive_file: Long,
      file_title: String,
      status: String,
      error_message: Option[String],
      total_chunks: Long,
      progress_percent: Double)

  def points(files: DataFrame,
             settings: graft.PipelineSettings = graft.PipelineSettings.default): Dataset[PointRecord] = {
    val spark = files.sparkSession
    import spark.implicits._
    IngestPipeline.run(files, settings).as[PointRecord]
  }

  def ledger(files: DataFrame,
             settings: graft.PipelineSettings = graft.PipelineSettings.default): Dataset[LedgerRecord] = {
    val spark = files.sparkSession
    import spark.implicits._
    IngestPipeline.ledger(files, settings).as[LedgerRecord]
  }

  /** Mirror of one granular status-history row (T2 state machine,
    * embedding_job.json:60-67).
    */
  final case class StageRecord(
      source_drive_file: Long,
      file_title: String,
      stage_seq: Long,
      status: String,
      progress_percent: Double,
      error_message: Option[String])

  def ledgerStages(files: DataFrame,
                   settings: graft.PipelineSettings = graft.PipelineSettings.default): Dataset[StageRecord] = {
    val spark = files.sparkSession
    import spark.implicits._
    IngestPipeline.ledgerStages(files, settings).as[StageRecord]
  }
}
