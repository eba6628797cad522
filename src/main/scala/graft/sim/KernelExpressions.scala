package graft.sim

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Native codegen'd similarity expressions bound to the byte-level
  * kernels in [[SimKernels]]. Null semantics: the kernels implement the
  * reference's null -> 0.0, so nulls are handled INSIDE eval (these
  * expressions never return null).
  */
abstract class SimKernelExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")

  /** fully-qualified static kernel, e.g. "graft.sim.SimKernels.levSim" */
  protected def kernel: String

  protected def evalKernel(a: org.apache.spark.unsafe.types.UTF8String,
                           b: org.apache.spark.unsafe.types.UTF8String): Double

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val b = right.eval(input).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    evalKernel(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val la = ctx.freshName("ka")
    val lb = ctx.freshName("kb")
    val block =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        org.apache.spark.unsafe.types.UTF8String $la =
          ${leftGen.isNull} ? null : ${leftGen.value};
        org.apache.spark.unsafe.types.UTF8String $lb =
          ${rightGen.isNull} ? null : ${rightGen.value};
        double ${ev.value} = $kernel($la, $lb);
      """
    ev.copy(code = block, isNull = FalseLiteral)
  }
}

case class LevSimExpr(left: Expression, right: Expression) extends SimKernelExpression {
  override def prettyName: String = "lev_sim"
  override protected def kernel: String = "graft.sim.SimKernels.levSim"
  override protected def evalKernel(a: org.apache.spark.unsafe.types.UTF8String,
                                    b: org.apache.spark.unsafe.types.UTF8String): Double =
    SimKernels.levSim(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LevSimExpr =
    copy(left = l, right = r)
}

case class TokenJaccardExpr(left: Expression, right: Expression) extends SimKernelExpression {
  override def prettyName: String = "token_jaccard"
  override protected def kernel: String = "graft.sim.SimKernels.tokenJaccard"
  override protected def evalKernel(a: org.apache.spark.unsafe.types.UTF8String,
                                    b: org.apache.spark.unsafe.types.UTF8String): Double =
    SimKernels.tokenJaccard(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenJaccardExpr =
    copy(left = l, right = r)
}

case class JaroWinklerSimExpr(left: Expression, right: Expression) extends SimKernelExpression {
  override def prettyName: String = "jaro_winkler"
  override protected def kernel: String = "graft.sim.SimKernels.jaroWinkler"
  override protected def evalKernel(a: org.apache.spark.unsafe.types.UTF8String,
                                    b: org.apache.spark.unsafe.types.UTF8String): Double =
    SimKernels.jaroWinkler(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSimExpr =
    copy(left = l, right = r)
}
