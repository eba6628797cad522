package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Pushdown barrier for an EXPENSIVE derived column: identity on the
  * value, but declared non-deterministic so the optimizer may not
  * duplicate, push or reorder it.
  *
  * Why it exists: `withColumn("score", expensive).where($"score" >= t)`
  * lets Catalyst substitute the alias into the filter and push the
  * filter into the upstream join as a RESIDUAL predicate — the join then
  * evaluates `expensive` once per joined row, and the projection above
  * evaluates it AGAIN for every surviving row (measured on the near-dup
  * verify: the jaccard CASE ran in both the SortMergeJoin condition and
  * the Project — two ~12 cpu-s stages for one logical pass). A
  * non-deterministic expression cannot be pushed through a join or
  * duplicated (guide §4.4 applies the same fix to Python UDFs), so the
  * plan keeps exactly one evaluation in the Project with the Filter
  * above it. The wrapped expression IS deterministic — the marker is
  * only a fence — so task retries still recompute identical values and
  * results are unaffected.
  *
  * Use it only on genuinely expensive scalar columns: the fence also
  * stops legitimate pushdown of OTHER filters past this projection.
  */
case class EvalOnceExpr(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_once"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): EvalOnceExpr =
    copy(child = newChild)
}

object EvalOnce {
  def apply(c: Column): Column = Bridge.column(EvalOnceExpr(Bridge.expression(c)))
}
