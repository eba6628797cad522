package graft.sim

import org.apache.spark.unsafe.types.UTF8String

/** Allocation-light similarity kernels over UTF8String for the hot
  * scoring path. ASCII inputs (the overwhelming case) are processed
  * directly on the byte arrays with ThreadLocal scratch buffers — no
  * String materialization, no regex, no per-call arrays. Non-ASCII falls
  * back to the reference-exact String ports in [[Levenshtein]] /
  * [[JaroWinkler]] / [[Jaccard]].
  *
  * Semantics are bit-for-bit the reference's (null -> 0, equal -> 1,
  * empty -> 0; Jaccard lowercases then splits on \s+ and dedups;
  * similarity formulas composed with the same IEEE operation order), so
  * swapping these in changes nothing observable — verified by the golden
  * suites and the DuckDB oracle.
  */
object SimKernels {

  private def isAscii(s: UTF8String): Boolean = s.numBytes() == s.numChars()

  // ---------------------------------------------------------------- lev

  private val levScratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](2048)
  }

  /** Levenshtein similarity 1 - dist/max(len)
    * (similarity/LevenshteinSimilarity.java:10-31).
    */
  def levSim(a: UTF8String, b: UTF8String): Double = {
    if (a == null || b == null) return 0.0
    if (a.equals(b)) return 1.0
    if (a.numBytes() == 0 || b.numBytes() == 0) return 0.0
    if (!(isAscii(a) && isAscii(b))) {
      return Levenshtein.similarity(a.toString, b.toString)
    }
    val ab = a.getBytes
    val bb = b.getBytes
    // ensure the shorter string indexes the rows (O(min) space)
    val (s, t) = if (ab.length <= bb.length) (ab, bb) else (bb, ab)
    val m = s.length
    val n = t.length
    var scratch = levScratch.get()
    if (scratch.length < 2 * (m + 1)) {
      scratch = new Array[Int](Integer.highestOneBit(2 * (m + 1)) * 2)
      levScratch.set(scratch)
    }
    var prevOff = 0
    var currOff = m + 1
    var i = 0
    while (i <= m) { scratch(i) = i; i += 1 }
    var j = 1
    while (j <= n) {
      scratch(currOff) = j
      val tc = t(j - 1)
      i = 1
      while (i <= m) {
        val cost = if (s(i - 1) == tc) 0 else 1
        var v = scratch(currOff + i - 1) + 1
        val del = scratch(prevOff + i) + 1
        if (del < v) v = del
        val sub = scratch(prevOff + i - 1) + cost
        if (sub < v) v = sub
        scratch(currOff + i) = v
        i += 1
      }
      val tmp = prevOff; prevOff = currOff; currOff = tmp
      j += 1
    }
    val dist = scratch(prevOff + m)
    1.0 - dist.toDouble / math.max(ab.length, bb.length)
  }

  // ----------------------------------------------------------------- jw

  private val jwScratch = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](4096)
  }

  /** Jaro-Winkler (similarity/JaroWinklerSimilarity.java:9-110). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    if (a == null || b == null) return 0.0
    if (a.equals(b)) return 1.0
    if (a.numBytes() == 0 || b.numBytes() == 0) return 0.0
    if (!(isAscii(a) && isAscii(b))) {
      return JaroWinkler.similarity(a.toString, b.toString)
    }
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    val matchWindow = math.max(0, math.max(l1, l2) / 2 - 1)
    var scratch = jwScratch.get()
    if (scratch.length < l1 + l2) {
      scratch = new Array[Boolean](Integer.highestOneBit(l1 + l2) * 2)
      jwScratch.set(scratch)
    } else {
      java.util.Arrays.fill(scratch, 0, l1 + l2, false)
    }
    val m1Off = 0
    val m2Off = l1
    var matches = 0
    var i = 0
    while (i < l1) {
      val start = math.max(0, i - matchWindow)
      val end = math.min(i + matchWindow + 1, l2)
      var j = start
      var done = false
      while (j < end && !done) {
        if (!scratch(m2Off + j) && s1(i) == s2(j)) {
          scratch(m1Off + i) = true
          scratch(m2Off + j) = true
          matches += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (scratch(m1Off + i)) {
        while (!scratch(m2Off + k)) k += 1
        if (s1(i) != s2(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val t = transpositions / 2.0
    val jaro = ((m / l1) + (m / l2) + ((m - t) / m)) / 3.0
    var prefix = 0
    val maxPrefix = math.min(JaroWinkler.MaxPrefixLength, math.min(l1, l2))
    while (prefix < maxPrefix && s1(prefix) == s2(prefix)) prefix += 1
    jaro + prefix * JaroWinkler.DefaultScalingFactor * (1.0 - jaro)
  }

  // ------------------------------------------------------------ jaccard

  private val jacScratch = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](512)
  }

  private def isJavaSpace(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  private def lower(c: Byte): Byte =
    if (c >= 'A' && c <= 'Z') (c + 32).toByte else c

  /** FNV-1a over the lowercased bytes of [from, to). 0 is reserved as the
    * empty-slot marker (remapped).
    */
  private def tokenHash(bytes: Array[Byte], from: Int, to: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < to) {
      h ^= lower(bytes(i)) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    if (h == 0L) 0x9e3779b97f4a7c15L else h
  }

  /** Insert into an open-addressed set stored in `table[off, off+cap)`.
    * Returns true if newly inserted.
    */
  private def insert(table: Array[Long], off: Int, cap: Int, h: Long): Boolean = {
    var idx = ((h ^ (h >>> 32)).toInt & (cap - 1))
    while (true) {
      val cur = table(off + idx)
      if (cur == 0L) { table(off + idx) = h; return true }
      if (cur == h) return false
      idx = (idx + 1) & (cap - 1)
    }
    false
  }

  private def contains(table: Array[Long], off: Int, cap: Int, h: Long): Boolean = {
    var idx = ((h ^ (h >>> 32)).toInt & (cap - 1))
    while (true) {
      val cur = table(off + idx)
      if (cur == 0L) return false
      if (cur == h) return true
      idx = (idx + 1) & (cap - 1)
    }
    false
  }

  /** Token-set Jaccard (similarity/JaccardSimilarity.java:24-64):
    * lowercase, split \s+, dedup, |∩|/|∪|. Single pass over the bytes,
    * token identity via 64-bit FNV (collision odds ~n^2/2^64 —
    * deterministic and corpus-verified against the exact oracle).
    */
  def tokenJaccard(a: UTF8String, b: UTF8String): Double = {
    if (a == null || b == null) return 0.0
    if (a.equals(b)) return 1.0
    if (a.numBytes() == 0 || b.numBytes() == 0) return 0.0
    if (!(isAscii(a) && isAscii(b))) {
      return Jaccard.similarity(a.toString, b.toString)
    }
    val ab = a.getBytes
    val bb = b.getBytes
    // worst-case token counts to size the two tables (power of two, 2x)
    def capFor(len: Int): Int = {
      var c = 16
      while (c < len + 2) c <<= 1
      c
    }
    val capA = capFor(ab.length / 2 + 1)
    val capB = capFor(bb.length / 2 + 1)
    var table = jacScratch.get()
    if (table.length < capA + capB) {
      table = new Array[Long](Integer.highestOneBit(capA + capB) * 2)
      jacScratch.set(table)
    } else {
      java.util.Arrays.fill(table, 0, capA + capB, 0L)
    }
    var sizeA = 0
    var i = 0
    while (i < ab.length) {
      while (i < ab.length && isJavaSpace(ab(i))) i += 1
      val start = i
      while (i < ab.length && !isJavaSpace(ab(i))) i += 1
      if (i > start && insert(table, 0, capA, tokenHash(ab, start, i))) sizeA += 1
    }
    var sizeB = 0
    var inter = 0
    i = 0
    while (i < bb.length) {
      while (i < bb.length && isJavaSpace(bb(i))) i += 1
      val start = i
      while (i < bb.length && !isJavaSpace(bb(i))) i += 1
      if (i > start) {
        val h = tokenHash(bb, start, i)
        if (insert(table, capA, capB, h)) {
          sizeB += 1
          if (contains(table, 0, capA, h)) inter += 1
        }
      }
    }
    if (sizeA == 0 && sizeB == 0) return 1.0
    if (sizeA == 0 || sizeB == 0) return 0.0
    val union = sizeA + sizeB - inter
    inter.toDouble / union
  }
}
