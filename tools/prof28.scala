// Prototype: which queries' INITIAL physical plans contain a
// CartesianProductExec (i.e. a cross join Spark did NOT plan as a
// broadcast nested loop)? Candidate PlanShapeSpec sweep.
// Run: spark-shell --master local[8] --driver-class-path target/scala-2.13/classes -I tools/prof28.scala
import org.apache.spark.sql.execution.joins.CartesianProductExec
val d = "/root/testdata/sf0.001"
graft.expressions.GraftFunctions.register(spark)
var bad = List.empty[String]
var failed = List.empty[(String, String)]
for ((name, q) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
  try {
    val plan = q(spark, d).queryExecution.sparkPlan
    val n = plan.collectWithSubqueries { case c: CartesianProductExec => c }.size
    if (n > 0) bad ::= s"$name ($n)"
  } catch { case e: Throwable => failed ::= (name, e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(80)); if (failed.size == 1) e.printStackTrace() }
}
println(s"[prof28] cartesian: ${bad.size} -> ${bad.sorted.mkString(", ")}")
println(s"[prof28] failed-to-plan: ${failed.size}")
failed.sortBy(_._1).foreach { case (n, m) => println(s"  $n: $m") }
sys.exit(0)
