package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two `array<float>` columns as a native Catalyst
  * expression WITH whole-stage codegen (SURVEY.md §4: the one operator
  * worth a custom Expression — Qdrant COSINE distance semantics,
  * reference: frappe_data_pipelines/services/qdrant_service.py:80-84).
  *
  * Why not `aggregate(zip_with(...))`: Catalyst evaluates higher-order
  * lambdas interpreted (no codegen), measured ~20× slower on the scan
  * side of top-k at sf0.1. This expression compiles to a tight fused
  * Java loop (one pass computes dot and both norms).
  *
  * Numeric contract: accumulates in double, element order left-to-right,
  * identical to the previous fold and to DuckDB's `list_reduce` — scores
  * are bit-equal, so oracle hashes are unchanged.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  /** Nullable beyond input nulls (review finding r14): mismatched
    * lengths and null ELEMENTS both yield null, matching the
    * `aggregate(zip_with(...))` fold this expression replaced (zip_with
    * pads the shorter side with nulls → null dot) and the DuckDB
    * oracle (out-of-range list index → NULL). The old code silently
    * truncated both vectors to min(length) — a plausible-but-wrong
    * finite score that MASKED the dimension-uniformity violations the
    * health checks exist to surface — and read null elements as 0.0f
    * in the unsafe path while NPE-ing interpreted.
    */
  override def nullable: Boolean = true

  // static per plan — lazy val, not def: the interpreted path calls it
  // per ROW, and a def re-allocated the Seq and re-matched both child
  // types on every evaluation (review finding r15). @transient so a
  // serialized expression recomputes it after landing on an executor.
  @transient private lazy val elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    })

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val checkNulls = elementsNullable
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      // the element null check is emitted only when the STATIC type says
      // elements can be null — a containsNull=false schema keeps the
      // original check-free fused loop
      val nullBreak =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullBreak
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
