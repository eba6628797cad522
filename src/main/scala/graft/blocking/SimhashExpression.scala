package graft.blocking

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Zero-allocation 60-bit SimHash kernel.
  *
  * Semantically identical to the staged higher-order-function plan
  * (lower -> split \s+ -> drop empties -> tokenHashes/tokenHashes2 ->
  * [[BlockingKeys.simhash60FromHashes]]; pinned by the native==HOF
  * property test and the q19/q31 oracles), but computed in ONE pass over
  * the string bytes. The HOF plan evaluates 60 bit-vote `aggregate`
  * expressions, each walking the full token-hash array — 60 array
  * traversals plus a per-character split allocation inside every rolling
  * hash. Here each token's two rolling hashes are folded as the bytes
  * stream by and vote on all 60 bits immediately.
  *
  * ASCII fast path lowercases bytes inline (Java \s is ASCII-only, so
  * token boundaries are byte-testable); non-ASCII falls back to the
  * UTF8String lowercase + regex split + codepoint fold — the exact
  * column-expression semantics.
  */
object SimhashKernel {

  import BlockingKeys.{P, P2, SimHashBits}

  private def isJavaSpace(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  private def lowerByte(c: Byte): Long =
    if (c >= 'A' && c <= 'Z') (c + 32).toLong else (c & 0xffL)

  private def vote(h1: Long, h2: Long, votes: Array[Int]): Unit = {
    var bit = 0
    while (bit < SimHashBits) {
      votes(bit) += ((((h1 >>> bit) & 1L) << 1) - 1L).toInt
      votes(SimHashBits + bit) += ((((h2 >>> bit) & 1L) << 1) - 1L).toInt
      bit += 1
    }
  }

  /** 60-bit fingerprint of a raw text; null/empty/all-whitespace -> 0
    * (no tokens -> zero votes -> no bits set, matching the HOF chain).
    */
  def simhash60(s: UTF8String): Long = {
    if (s == null || s.numBytes() == 0) return 0L
    val votes = new Array[Int](2 * SimHashBits)
    if (s.numBytes() == s.numChars()) {
      val b = s.getBytes
      val n = b.length
      var i = 0
      while (i < n) {
        while (i < n && isJavaSpace(b(i))) i += 1
        if (i < n) {
          var h1 = 0L
          var h2 = 0L
          while (i < n && !isJavaSpace(b(i))) {
            val c = lowerByte(b(i))
            h1 = (h1 * 31L + c) % P
            h2 = (h2 * 131L + c) % P2
            i += 1
          }
          vote(h1, h2, votes)
        }
      }
    } else {
      // exact mirror of lower(col) -> split("\\s+") -> codepoint fold
      val cps = s.toLowerCase.toString.codePoints().toArray
      val n = cps.length
      var i = 0
      while (i < n) {
        while (i < n && isJavaSpace(cps(i))) i += 1
        if (i < n) {
          var h1 = 0L
          var h2 = 0L
          while (i < n && !isJavaSpace(cps(i))) {
            val c = cps(i).toLong
            h1 = (h1 * 31L + c) % P
            h2 = (h2 * 131L + c) % P2
            i += 1
          }
          vote(h1, h2, votes)
        }
      }
    }
    var lo = 0L
    var hi = 0L
    var bit = 0
    while (bit < SimHashBits) {
      if (votes(bit) > 0) lo |= 1L << bit
      if (votes(SimHashBits + bit) > 0) hi |= 1L << bit
      bit += 1
    }
    (hi << SimHashBits) | lo
  }
}

/** Catalyst expression form of [[SimhashKernel.simhash60]] (codegen'd). */
case class Simhash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")

  override def eval(input: InternalRow): Any =
    SimhashKernel.simhash60(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val in = ctx.freshName("shIn")
    val block =
      code"""
        ${childGen.code}
        org.apache.spark.unsafe.types.UTF8String $in =
          ${childGen.isNull} ? null : ${childGen.value};
        long ${ev.value} = graft.blocking.SimhashKernel.simhash60($in);
      """
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash60Expr =
    copy(child = newChild)
}
