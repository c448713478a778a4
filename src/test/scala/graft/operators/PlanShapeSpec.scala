package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Structural plan guard over the ENTIRE query surface: no query's
  * physical plan may contain a CartesianProductExec. The engine uses
  * ~50 `crossJoin`s, every one against a broadcast scalar/bounded
  * relation — which Spark plans as BroadcastNestedLoopJoin, not a
  * cartesian shuffle; a CartesianProductExec appearing anywhere means
  * someone crossed two corpus-sized relations (the r10-class
  * scale-killer every VERDICT audit greps for by hand). This pins the
  * audited property mechanically for every current and future query.
  *
  * Planning only — the extended explain string resolves the full
  * physical plan (including subquery plans and the AQE initial plan)
  * without running the query; the only execution this sweep pays is
  * the eager artifact builds some owner queries perform during
  * CONSTRUCTION, all sub-second at sf0.001. String-matched rather than
  * node-collected: `sparkPlan.collectWithSubqueries` CCEs on
  * still-logical subquery plans, and AQE's wrapper hides the inner
  * plan from `executedPlan.collect`.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("no query plans a CartesianProduct (all cross joins broadcast)") {
    graft.expressions.GraftFunctions.register(spark)
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan = q(spark, d).queryExecution.explainString(mode)
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning CartesianProductExec: ${offenders.mkString(", ")}")
  }
}
