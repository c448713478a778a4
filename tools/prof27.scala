// Round-11 plan audit: the new queries at sf0.1 — exchange shapes +
// cold/warm timings. Run: spark-shell --master local[32] \
//   --driver-class-path target/scala-2.13/classes -I tools/prof27.scala
val d = "/root/testdata/sf0.1"
val names = Seq("window_funnel", "funnel_steps_4", "g2_structured_chunks",
  "ann_recall_clustered", "ann_lsh_plane_curve_clustered", "p14_dimension_table")
for (n <- names) {
  val q = graft.SparkEntry.queries(n)
  val df = q(spark, d)
  val t0 = System.nanoTime(); df.count(); val cold = (System.nanoTime() - t0) / 1e9
  val t1 = System.nanoTime(); q(spark, d).count(); val warm = (System.nanoTime() - t1) / 1e9
  val plan = q(spark, d).queryExecution.executedPlan.toString
  val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
  val nReuse = "ReusedExchange".r.findAllIn(plan).length
  println(f"[prof27] $n%-30s cold=$cold%6.2fs warm=$warm%6.2fs exchanges=$nEx reused=$nReuse")
}
sys.exit(0)
