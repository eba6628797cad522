package graft.blocking

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Zero-allocation MinHash LSH band-key kernel.
  *
  * Semantically identical to the staged higher-order-function plan in
  * [[BlockingKeys.minhashKeyTable]]'s original form (shingles ->
  * rolling-hash -> 16 affine minima -> 4 band keys; pinned by the
  * native-equals-HOF property test and the q17/q18 oracle), but computed
  * in one pass over the string bytes with no intermediate arrays. The HOF
  * plan allocates thousands of objects per row (a UTF8String per shingle,
  * a per-character split array inside every rolling hash, 16 transformed
  * copies of the hash array); at high parallelism that allocation storm
  * makes the keys stage GC-bound — measured 1.5x scaling from 4 to 16
  * cores where this kernel's stage scales like the other CPU kernels.
  *
  * Two properties make the fusion exact:
  *  - `array_distinct` before the minima is droppable: a minimum is
  *    multiplicity-blind;
  *  - the per-shingle rolling hash (fold (acc*31+codepoint) % P) visits
  *    each 3-gram's characters directly, so h(i) needs no shared state
  *    with h(i-1) — the kernel just re-reads 3 bytes.
  *
  * ASCII fast path reads bytes; non-ASCII falls back to codepoints (equal
  * for every string the engine ingests — codepoint == byte below 0x80).
  */
object MinhashKernel {

  import BlockingKeys.{Bands, Coef, NumHashes, P, RowsPerBand}

  private val as: Array[Long] = Coef.map(_._1).toArray
  private val bs: Array[Long] = Coef.map(_._2).toArray

  private def updateSigs(h: Long, sigs: Array[Long]): Unit = {
    var j = 0
    while (j < NumHashes) {
      val v = (as(j) * h + bs(j)) % P
      if (v < sigs(j)) sigs(j) = v
      j += 1
    }
  }

  /** Band keys for a string; null/empty -> empty array (mirrors
    * [[BlockingKeys.minhashBandKeys]]'s null/empty guard).
    */
  def bandKeys(s: UTF8String): ArrayData = {
    if (s == null || s.numBytes() == 0)
      return new GenericArrayData(Array.empty[Any])
    val sigs = new Array[Long](NumHashes)
    java.util.Arrays.fill(sigs, P)
    if (s.numBytes() == s.numChars()) {
      val b = s.getBytes
      val n = b.length
      if (n >= 3) {
        var i = 0
        while (i + 3 <= n) {
          var h = (b(i) & 0xffL) % P
          h = (h * 31 + (b(i + 1) & 0xffL)) % P
          h = (h * 31 + (b(i + 2) & 0xffL)) % P
          updateSigs(h, sigs)
          i += 1
        }
      } else {
        var h = 0L
        var i = 0
        while (i < n) { h = (h * 31 + (b(i) & 0xffL)) % P; i += 1 }
        updateSigs(h, sigs)
      }
    } else {
      val cps = s.toString.codePoints().toArray
      val n = cps.length
      if (n >= 3) {
        var i = 0
        while (i + 3 <= n) {
          var h = cps(i).toLong % P
          h = (h * 31 + cps(i + 1)) % P
          h = (h * 31 + cps(i + 2)) % P
          updateSigs(h, sigs)
          i += 1
        }
      } else {
        var h = 0L
        var i = 0
        while (i < n) { h = (h * 31 + cps(i)) % P; i += 1 }
        updateSigs(h, sigs)
      }
    }
    val out = new Array[Any](Bands)
    val sb = new java.lang.StringBuilder(56)
    var band = 0
    while (band < Bands) {
      sb.setLength(0)
      sb.append("lsh:").append(band).append(':')
      var r = 0
      while (r < RowsPerBand) {
        if (r > 0) sb.append('_')
        sb.append(sigs(band * RowsPerBand + r))
        r += 1
      }
      out(band) = UTF8String.fromString(sb.toString)
      band += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression form of [[MinhashKernel.bandKeys]] (codegen'd). */
case class MinhashBandKeysExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_band_keys"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")

  override def eval(input: InternalRow): Any =
    MinhashKernel.bandKeys(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val in = ctx.freshName("mhIn")
    val block =
      code"""
        ${childGen.code}
        org.apache.spark.unsafe.types.UTF8String $in =
          ${childGen.isNull} ? null : ${childGen.value};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.blocking.MinhashKernel.bandKeys($in);
      """
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeysExpr =
    copy(child = newChild)
}
