package graft.norm

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full normalization chain (N1–N4) as ONE native expression.
  *
  * Chained `regexp_replace` built-ins are semantically right but pay a
  * UTF8String -> String -> UTF8String round trip per RULE per row (17
  * conversions for the COMPANY chain) plus an expression-eval hop each.
  * This expression converts once, runs the same priority-ordered
  * java.util.regex patterns (the SAME engine and replacement semantics
  * as Spark's RegExpReplace — `Matcher.replaceAll`), then applies the
  * final cleanup with the same primitives the built-in chain uses:
  *  - lower via UTF8String.toLowerCase (Spark's `lower`);
  *  - whitespace collapse via the same `\s+` regex;
  *  - trim of ' ' only (Spark's `trim` strips spaces, not all <= 0x20);
  *  - null -> "" (the chain's closing coalesce).
  *
  * Property-tested equal to [[Normalizer.normalizeColumn]] and covered by
  * the q01 oracle at sf0.01.
  */
case class NormalizeExpr(child: Expression, entityType: Option[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")

  @transient private lazy val compiledRules: Array[(Pattern, String)] =
    Normalizer.rulesFor(entityType)
      .map(r => (Pattern.compile("(?i)" + r.pattern), r.replacement)).toArray

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")

  /** Kernel, invoked from both eval and generated code. */
  def normalizeKernel(s: UTF8String): UTF8String = {
    if (s == null) return UTF8String.EMPTY_UTF8
    var r = s.toString
    val rules = compiledRules
    var i = 0
    while (i < rules.length) {
      r = rules(i)._1.matcher(r).replaceAll(rules(i)._2)
      i += 1
    }
    // lower with Spark's own semantics, then collapse, then space-trim
    r = UTF8String.fromString(r).toLowerCase.toString
    r = ws.matcher(r).replaceAll(" ")
    var from = 0
    var to = r.length
    while (from < to && r.charAt(from) == ' ') from += 1
    while (to > from && r.charAt(to - 1) == ' ') to -= 1
    UTF8String.fromString(r.substring(from, to))
  }

  override def eval(input: InternalRow): Any =
    normalizeKernel(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("normExpr", this, classOf[NormalizeExpr].getName)
    val in = ctx.freshName("normIn")
    val block =
      code"""
        ${childGen.code}
        org.apache.spark.unsafe.types.UTF8String $in =
          ${childGen.isNull} ? null : ${childGen.value};
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          $self.normalizeKernel($in);
      """
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}
