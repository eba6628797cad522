package graft.sim

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property parity: the native byte-level kernels (SimKernels — ASCII
  * fast path, ThreadLocal scratch reuse/regrowth, open-addressing token
  * table) must be BIT-EXACT against the reference String ports
  * (Levenshtein/JaroWinkler/Jaccard, the q28-proven semantics) on an
  * adversarial seeded corpus. The sf0.01 oracle only exercises the
  * kernels on normalized company names; this spec drives the edges the
  * corpus never hits: whitespace runs/tabs, scratch-regrow lengths,
  * maximal single-char token counts, and the ASCII/non-ASCII gate
  * (numBytes != numChars) in both directions of a pair.
  */
class KernelParitySpec extends AnyFunSuite {

  private def u(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)

  private def checkPair(a: String, b: String): Unit = {
    val (ua, ub) = (u(a), u(b))
    assert(SimKernels.levSim(ua, ub) == Levenshtein.similarity(a, b),
      s"lev mismatch for '$a' vs '$b'")
    assert(SimKernels.jaroWinkler(ua, ub) == JaroWinkler.similarity(a, b),
      s"jw mismatch for '$a' vs '$b'")
    assert(SimKernels.tokenJaccard(ua, ub) == Jaccard.similarity(a, b),
      s"jaccard mismatch for '$a' vs '$b'")
  }

  test("seeded random ASCII phrases: byte kernels == String ports (bit-exact)") {
    val rng = new scala.util.Random(4242)
    val punct = " \t  .,-&'"
    def word = (1 to 1 + rng.nextInt(10)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    def phrase = {
      val sb = new StringBuilder
      (1 to 1 + rng.nextInt(5)).foreach { _ =>
        sb.append(word)
        sb.append(punct(rng.nextInt(punct.length)))
      }
      sb.toString
    }
    (1 to 2000).foreach { _ =>
      val a = phrase
      val b = rng.nextInt(3) match {
        case 0 => phrase                      // unrelated
        case 1 => a                           // equal (short-circuit)
        case _ =>                             // near-dup: one edit
          val i = rng.nextInt(a.length)
          a.substring(0, i) + ('a' + rng.nextInt(26)).toChar + a.substring(math.min(i + 1, a.length))
      }
      checkPair(a, b)
    }
  }

  test("whitespace runs, empties, and maximal token counts") {
    checkPair("", "")
    checkPair("", "x")
    checkPair("   ", "x y")
    checkPair("\t\t", "  ")
    checkPair("a b c d e f g h", "a  b\tc   d")
    // maximal single-char tokens: len/2+1 tokens stresses the table cap
    val many = (1 to 600).map(i => ('a' + i % 26).toChar).mkString(" ")
    checkPair(many, many.reverse)
    checkPair(many, "a b c")
  }

  test("scratch regrowth: strings past the preallocated kernel buffers") {
    val rng = new scala.util.Random(7)
    def long(n: Int) = (1 to n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    // lev scratch preallocates 2048 ints (m <= 1023); jw 4096 booleans
    val a = long(1500)
    val b = a.take(700) + long(800)
    checkPair(a, b)
    checkPair(long(3000), long(2900))
    // regrown scratch must be correctly reused by a later SHORT pair on
    // the same thread (stale high cells must not leak into the window)
    checkPair("kitten", "sitting")
  }

  test("lev word boundaries: middles straddling the 64/128-bit Myers blocks") {
    // after prefix/suffix trim the Myers pattern length decides the
    // single-word vs block path — drive lengths right at the seams
    val rng = new scala.util.Random(6464)
    def s(n: Int) = (1 to n).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    for (m <- Seq(1, 2, 63, 64, 65, 127, 128, 129, 193);
         n <- Seq(1, 63, 64, 65, 200)) {
      checkPair(s(m), s(n))
      // shared prefix+suffix so the TRIMMED middle hits the length
      val mid1 = s(m); val mid2 = s(n)
      checkPair("prefix " + mid1 + " suffix", "prefix " + mid2 + " suffix")
    }
    // small-alphabet exhaustive-ish: dense match vectors stress carries
    (1 to 500).foreach { _ =>
      checkPair(s(1 + rng.nextInt(70)), s(1 + rng.nextInt(70)))
    }
  }

  test("ASCII/non-ASCII gate: fallback fires per pair, same result shape") {
    val pairs = Seq(
      ("café royale", "cafe royale"),      // one side multi-byte
      ("münchen ag", "munchen ag"),
      ("東京 株式会社", "東京 会社"),          // CJK
      ("naïve co", "naïve co"),            // equal unicode
      ("emoji 🎉 corp", "emoji corp"),      // surrogate pair
      ("ascii only", "café"))              // mixed directions
    pairs.foreach { case (a, b) => checkPair(a, b); checkPair(b, a) }
  }

  test("nulls propagate identically") {
    checkPair(null, "x")
    checkPair("x", null)
    checkPair(null, null)
  }
}
