package graft.sim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Native Catalyst expression for Jaro-Winkler similarity.
  *
  * Re-expresses similarity/JaroWinklerSimilarity.java:9-110 as a
  * whole-stage-codegen-friendly binary expression: the generated Java
  * calls the static kernel [[JaroWinkler.similarityUtf8]] directly, so the
  * scoring stage stays inside WholeStageCodegen with no UDF
  * serialization/Row boxing (cf. SURVEY.md §4 "custom Catalyst" note).
  *
  * Null semantics: reference returns 0.0 for null inputs; the composite
  * scorer wraps this expression in a null guard, so standard null-in ->
  * null-out here is fine (BinaryExpression default).
  */
case class JaroWinklerExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarityUtf8(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.sim.JaroWinkler.similarityUtf8($a, $b)")

  override def prettyName: String = "jaro_winkler"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
