import org.apache.spark.sql.functions._
val d = "/root/testdata/sf0.1"
def time(name: String)(f: => Long): Unit = {
  (1 to 3).foreach { i =>
    val t0 = System.nanoTime(); val n = f
    println(s"TIMED $name run$i: " + ((System.nanoTime() - t0) / 1e9) + s" sec rows=$n")
  }
}
time("dedup_clusters_current") { graft.SparkEntry.queries("dedup_clusters")(spark, d).count() }
System.exit(0)
