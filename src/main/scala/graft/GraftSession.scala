package graft

import org.apache.spark.sql.SparkSession

/** Session factory encoding the engine's deployment defaults (SURVEY.md
  * §7 scale notes). Local runs size the shuffle to the core count; the
  * same knobs are the ones to retune on a real cluster:
  *
  *  - `spark.sql.shuffle.partitions`: ≈ 2-3× total executor cores at
  *    cluster scale (AQE coalesces down, so err high)
  *  - `spark.sql.files.maxPartitionBytes` 128m: keeps a 100 TB scan at
  *    ~800k splits — large enough to amortize task overhead, small
  *    enough that a split's working set fits executor memory
  *  - AQE on (default in Spark 4): runtime re-plan gives skew-join
  *    splitting and shuffle coalescing for free
  *  - `GraftExtensions` injects the codegen expressions into every
  *    session without per-call registration
  */
object GraftSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[graft.expressions.GraftExtensions].getName)

  /** Local session for tests/tools. */
  def local(threads: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(threads)
      .master(s"local[$threads]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
