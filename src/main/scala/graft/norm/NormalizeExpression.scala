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

  @transient private lazy val guards: Array[NormGuard] =
    Normalizer.rulesFor(entityType).map(_.guard).toArray

  /** Per-thread reusable Matchers (Matcher is not thread-safe; one array
    * per executor thread, reset per row). Cuts one Matcher allocation per
    * rule per row from the hot normalize stage.
    */
  @transient private lazy val matchers: ThreadLocal[Array[java.util.regex.Matcher]] =
    ThreadLocal.withInitial(() => compiledRules.map(_._1.matcher("")))

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")

  /** Kernel, invoked from both eval and generated code.
    *
    * Hot-path shape (the normalize stage's task-CPU inflates ~1.5x from
    * 1 to 4 threads when every rule allocates a Matcher + scans — pure
    * allocation/memory pressure, measured): each rule first runs its
    * allocation-free [[NormGuard]] necessary-condition check and is
    * skipped outright when it provably cannot match; rules that may
    * match reuse a per-thread Matcher. The final
    * lower+collapse+trim cleanup is fused into one pass with a single
    * byte[] allocation when the string is pure ASCII (the overwhelming
    * case), falling back to the original UTF8String round trip
    * otherwise. Equivalence to the built-in regexp_replace chain is
    * property-tested (NormalizerSpec).
    */
  def normalizeKernel(s: UTF8String): UTF8String = {
    if (s == null) return UTF8String.EMPTY_UTF8
    var r = s.toString
    val rules = compiledRules
    val gs = guards
    val ms = matchers.get()
    var i = 0
    while (i < rules.length) {
      if (gs(i).mayMatch(r)) {
        val m = ms(i)
        m.reset(r)
        r = m.replaceAll(rules(i)._2)
      }
      i += 1
    }
    asciiCleanup(r)
  }

  /** lower + collapse-\s+ + trim-' ' in one pass, one allocation, for
    * pure-ASCII input; exact original path otherwise. The ASCII branch
    * is byte-for-byte equivalent: UTF8String.toLowerCase on ASCII maps
    * 'A'..'Z' (+32) only, java-regex \s is exactly [ \t\n\x0B\f\r], and
    * post-collapse trim of ' ' equals dropping leading/trailing \s runs.
    */
  private def asciiCleanup(r: String): UTF8String = {
    val n = r.length
    var ascii = true
    var i = 0
    while (ascii && i < n) {
      if (r.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (!ascii) {
      var t = UTF8String.fromString(r).toLowerCase.toString
      t = ws.matcher(t).replaceAll(" ")
      var from = 0
      var to = t.length
      while (from < to && t.charAt(from) == ' ') from += 1
      while (to > from && t.charAt(to - 1) == ' ') to -= 1
      return UTF8String.fromString(t.substring(from, to))
    }
    val out = new Array[Byte](n)
    var len = 0
    var pendingSpace = false
    i = 0
    while (i < n) {
      val c = r.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (isWs) {
        if (len > 0) pendingSpace = true // leading run drops (trim)
      } else {
        if (pendingSpace) { out(len) = ' '; len += 1; pendingSpace = false }
        out(len) = (if (c >= 'A' && c <= 'Z') c + 32 else c).toByte
        len += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, len)
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
