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
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
