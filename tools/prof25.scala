// Probe: cost of the two r10 dedup additions at sf0.1 (run via
//   sbt 'Test/runMain graft.tools.Prof25' — or spark-shell :load)
package graft.tools
object Prof25 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val d = "/root/testdata/sf0.1"
    for (q <- Seq("substring_dedup", "semdedup"); i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, d).count()
      println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
