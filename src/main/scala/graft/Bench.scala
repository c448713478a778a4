package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt)
    // Warm the session (codegen compiler, parquet footers, broadcast
    // machinery) so the first timed query isn't charged for it.
    Seq("documents", "embeddings", "orders", "lineitem", "customer")
      .foreach(t => try Tables.table(spark, sfDir, t).count() catch { case _: Throwable => () })
    // events is TIMESTAMP(NANOS) — only Tables.events sets the nanosAsLong
    // conf, so warming via Tables.table always threw and left it cold.
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      // failures are marked -1 so they can't masquerade as fast queries
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val ts = java.time.Instant.now().toString
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","ts":"$ts","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Full per-query record to a file too: the driver's stdout capture
    // truncates long tails, which made round-2 timings unrecoverable.
    try {
      val out = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        sys.props.getOrElse("user.dir", ".") + "/tools/bench_history.jsonl"))
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] history write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
