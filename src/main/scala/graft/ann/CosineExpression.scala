package graft.ann

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** One-pass cosine-similarity kernel over two embedding columns.
  *
  * Bit-identical to the higher-order-function formulation in
  * [[Ann.cosine]] (cast-to-double, then three left-fold dot products:
  * a·a, b·b, a·b — the fold order DuckDB's `list_reduce` oracle mirrors),
  * pinned by a property test. The HOF plan allocates a zipped array plus
  * a lambda frame per element per dot product (3 x dim objects per row);
  * this kernel reads both arrays once with three running accumulators —
  * the same native-beats-staged-HOF move as [[graft.blocking.MinhashKernel]].
  *
  * Null/edge semantics (all matching the HOF):
  *  - either input null, or lengths differ (zip_with pads with null and
  *    poisons the fold) -> null;
  *  - zero norm on either side -> 0.0.
  */
object CosineKernel {

  /** 3-accumulator single pass; `floatA`/`floatB` select the element
    * reader (embeddings are array<float>; derived vectors array<double>).
    */
  def cosine(a: ArrayData, b: ArrayData, floatA: Boolean, floatB: Boolean): Any = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null
    var aa = 0.0
    var bb = 0.0
    var ab = 0.0
    var i = 0
    while (i < n) {
      val x = if (floatA) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (floatB) b.getFloat(i).toDouble else b.getDouble(i)
      aa += x * x
      bb += y * y
      ab += x * y
      i += 1
    }
    val na = math.sqrt(aa)
    val nb = math.sqrt(bb)
    if (na == 0.0 || nb == 0.0) 0.0 else ab / (na * nb)
  }
}

case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got (${left.dataType}, ${right.dataType})")

  private def floatA: Boolean = elemType(left).contains(FloatType)
  private def floatB: Boolean = elemType(right).contains(FloatType)

  override def eval(input: InternalRow): Any =
    CosineKernel.cosine(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData], floatA, floatB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val la = ctx.freshName("cosA")
    val lb = ctx.freshName("cosB")
    val boxed = ctx.freshName("cosRes")
    val block =
      code"""
        ${lGen.code}
        ${rGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData $la =
          ${lGen.isNull} ? null : ${lGen.value};
        org.apache.spark.sql.catalyst.util.ArrayData $lb =
          ${rGen.isNull} ? null : ${rGen.value};
        Object $boxed = graft.ann.CosineKernel.cosine($la, $lb, $floatA, $floatB);
        boolean ${ev.isNull} = $boxed == null;
        double ${ev.value} = ${ev.isNull} ? 0.0 : ((Double) $boxed).doubleValue();
      """
    ev.copy(code = block)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}
