package graft

/** Engine configuration mirroring the reference's Data Pipeline Settings
  * singleton defaults (reference: frappe_data_pipelines/utils.py:26-41 and
  * doctype/data_pipeline_settings/data_pipeline_settings.json). A plain
  * immutable case class — configuration is not data (SURVEY.md §1.4).
  */
final case class PipelineSettings(
    chunkSize: Int = 1000,
    chunkOverlap: Int = 200,
    semanticTargetSize: Int = 2000,
    semanticOverlap: Int = 400,
    maxFileSizeMb: Int = 50,
    enabledFileTypes: Seq[String] = Seq("pdf", "docx", "txt", "md"),
    embeddingDimension: Int = 384,
    payloadTextTruncation: Int = 1000,     // tasks/process_embedding.py:394
    contextDocTruncation: Int = 32000,     // services/context_service.py:84-88
    upstreamDocTruncation: Int = 50000,    // tasks/process_embedding.py:194
    embedBatchSize: Int = 50,              // tasks/process_embedding.py:356
    rerankOverFetch: Int = 5,              // services/search_service.py:83
    defaultTopK: Int = 10,                 // services/search_service.py:66
    maxRetries: Int = 3,                   // tasks/process_embedding.py:527
    jobTtlDays: Int = 30                   // tasks/process_embedding.py:554
)

object PipelineSettings {
  val default: PipelineSettings = PipelineSettings()

  /** Chunk geometry tuned to the synthetic test corpus (docs ≤ ~560
    * chars — the reference's 1000/200 default would put every doc in
    * one chunk and exercise nothing). The oracle-gated pipeline
    * queries pass THIS, explicitly: chunk geometry is a real setting
    * ([[IngestPipeline.run]] honors [[PipelineSettings.chunkSize]] /
    * [[PipelineSettings.chunkOverlap]]), so the small-doc shape the
    * oracles pin must be requested, not hardcoded.
    */
  val smallDocs: PipelineSettings =
    PipelineSettings(chunkSize = 200, chunkOverlap = 40)
}
