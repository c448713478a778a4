package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for graft's native expressions.
  *
  * Two paths to the same builder:
  *  - [[GraftFunctions.register]] — imperative per-session registration
  *    (used by Tables/queries so any driver-provided session works)
  *  - [[GraftExtensions]] — `spark.sql.extensions=graft.expressions.GraftExtensions`
  *    for cluster-wide injection at session build (the production path)
  */
object GraftFunctions {

  val CosineName = "graft_cosine"

  private def cosineBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$CosineName expects 2 arguments, got ${args.length}")
    CosineSimilarity(args.head, args(1))
  }

  /** Idempotent; cheap enough to call on every table load. Guarded on
    * existence so repeated calls (one per query in a bench run) neither
    * retake the registry write lock nor emit the SimpleFunctionRegistry
    * "replaced a previously registered function" WARN per call. The
    * guard assumes no OTHER registrant uses the (namespaced)
    * "graft_cosine" name: an existing registration is trusted, not
    * repaired — a foreign builder squatting on the name would win.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(CosineName))) {
      reg.createOrReplaceTempFunction(CosineName, cosineBuilder, "built-in")
    }
  }

  private[expressions] val info =
    new ExpressionInfo(classOf[CosineSimilarity].getName, CosineName)

  val injected: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(CosineName), info, cosineBuilder)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.injected)
}
