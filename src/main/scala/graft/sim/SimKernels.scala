package graft.sim

import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-light similarity kernels over UTF8String for the hot
  * scoring path. ASCII inputs (the overwhelming case) are processed
  * IN PLACE on the string's backing memory (base object + offset via
  * Platform.getByte) with ThreadLocal scratch buffers — no String
  * materialization, no regex, no per-call arrays, and crucially no
  * `getBytes` copies: a UTF8String sliced out of an UnsafeRow (every
  * join output) is not array-aligned, so getBytes allocates a fresh
  * byte[] per call — six ~half-KB arrays per scored pair across the
  * three kernels, ~20 GB of eden churn per 10M pairs. That allocation
  * rate is invisible single-threaded but multiplies with threads and
  * was the measured source of the scoring stage's per-core CPU
  * inflation under parallelism (1.33x at 4 threads). Non-ASCII falls
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

  /** All-ASCII test = "no byte has its high bit set" (numBytes ==
    * numChars, but without numChars' per-char UTF-8 skip walk): scan 8
    * bytes per read. Runs twice per kernel call — 6x per scored pair —
    * so the constant matters.
    */
  private def isAscii(s: UTF8String): Boolean = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var i = 0
    while (i + 8 <= n) {
      if ((Platform.getLong(base, off + i) & 0x8080808080808080L) != 0L)
        return false
      i += 8
    }
    while (i < n) {
      if (bt(base, off, i) < 0) return false
      i += 1
    }
    true
  }

  /** In-place byte read: the ASCII kernels index the string's backing
    * memory directly (byte[] heap base or off-heap address) — the
    * JIT-intrinsified Unsafe access compiles to the same mov as an
    * array load, minus the copy getBytes would have made.
    */
  @inline private def bt(base: AnyRef, off: Long, i: Int): Byte =
    Platform.getByte(base, off + i)

  // ---------------------------------------------------------------- lev

  // Myers' bit-parallel Levenshtein (Myers, JACM 1999; global-distance
  // form per Hyyrö 2003, block extension as in edlib): exact unit-cost
  // edit distance in O(ceil(m/64) * n) word ops instead of the O(m*n)
  // cell DP — ~10-25x on the long names the scaling workload scores.
  // The distance is the same INTEGER, so the similarity double is
  // bit-identical to the classic DP / the reference String port
  // (property-gated by KernelParitySpec).

  /** Peq match-vector table: 256 chars x up to `peqBlocks` words.
    * Entries are zeroed per call by re-walking the pattern (O(m)), never
    * by clearing the table.
    */
  private val peqScratch = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](256 * 4)
  }
  private val vpvnScratch = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](2 * 64)
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
    val aBase = a.getBaseObject
    val aOff = a.getBaseOffset
    val lenA = a.numBytes()
    val bBase = b.getBaseObject
    val bOff = b.getBaseOffset
    val lenB = b.numBytes()
    // exact trim: edit distance is invariant under stripping a shared
    // prefix and suffix. Near-dup pairs — the common case in an ER
    // candidate set — collapse to a tiny middle (often a single token),
    // turning the quadratic core into a handful of word ops. The
    // similarity denominator stays the FULL lengths.
    var lo = 0
    val minLen = math.min(lenA, lenB)
    while (lo < minLen && bt(aBase, aOff, lo) == bt(bBase, bOff, lo)) lo += 1
    var hiA = lenA
    var hiB = lenB
    while (hiA > lo && hiB > lo &&
      bt(aBase, aOff, hiA - 1) == bt(bBase, bOff, hiB - 1)) { hiA -= 1; hiB -= 1 }
    val mA = hiA - lo
    val mB = hiB - lo
    val dist =
      if (mA == 0) mB
      else if (mB == 0) mA
      else if (mA <= mB) {
        if (mA <= 64) myersWord(aBase, aOff + lo, mA, bBase, bOff + lo, mB)
        else myersBlocks(aBase, aOff + lo, mA, bBase, bOff + lo, mB)
      } else {
        if (mB <= 64) myersWord(bBase, bOff + lo, mB, aBase, aOff + lo, mA)
        else myersBlocks(bBase, bOff + lo, mB, aBase, aOff + lo, mA)
      }
    1.0 - dist.toDouble / math.max(lenA, lenB)
  }

  /** Single-word Myers (pattern length m <= 64). VP starts all-ones:
    * garbage bits at-or-above m never reach lower bits (the addition's
    * carries travel upward only) and the score reads bit m-1.
    */
  private def myersWord(p: AnyRef, pOff: Long, m: Int,
                        t: AnyRef, tOff: Long, n: Int): Int = {
    val peq = peqScratch.get()
    var i = 0
    while (i < m) { peq(bt(p, pOff, i) & 0xff) |= 1L << i; i += 1 }
    var vp = -1L
    var vn = 0L
    var score = m
    val mask = 1L << (m - 1)
    var j = 0
    while (j < n) {
      val eq = peq(bt(t, tOff, j) & 0xff)
      val d0 = (((eq & vp) + vp) ^ vp) | eq | vn
      val hp = vn | ~(d0 | vp)
      val hn = vp & d0
      if ((hp & mask) != 0L) score += 1
      else if ((hn & mask) != 0L) score -= 1
      // the +1 carry-in models the first DP row D[0][j] = j
      val x = (hp << 1) | 1L
      vp = (hn << 1) | ~(x | d0)
      vn = x & d0
      j += 1
    }
    i = 0
    while (i < m) { peq(bt(p, pOff, i) & 0xff) = 0L; i += 1 }
    score
  }

  /** Block Myers for m > 64 (ceil(m/64) words per text char, +1/-1
    * carries chained bottom-up between blocks). The last block's partial
    * word needs no padding: the score reads bit (m-1) % 64, which bits
    * above it cannot influence, and its inter-block carry-out has no
    * consumer.
    */
  private def myersBlocks(p: AnyRef, pOff: Long, m: Int,
                          t: AnyRef, tOff: Long, n: Int): Int = {
    val w = (m + 63) >>> 6
    var peq = peqScratch.get()
    if (peq.length < 256 * w) {
      peq = new Array[Long](Integer.highestOneBit(256 * w) * 2)
      peqScratch.set(peq)
    }
    var i = 0
    while (i < m) {
      peq((bt(p, pOff, i) & 0xff) * w + (i >>> 6)) |= 1L << (i & 63)
      i += 1
    }
    var vs = vpvnScratch.get()
    if (vs.length < 2 * w) {
      vs = new Array[Long](Integer.highestOneBit(2 * w) * 2)
      vpvnScratch.set(vs)
    }
    val vnOff = w
    i = 0
    while (i < w) { vs(i) = -1L; vs(vnOff + i) = 0L; i += 1 }
    var score = m
    val lastMask = 1L << ((m - 1) & 63)
    var j = 0
    while (j < n) {
      val c = (bt(t, tOff, j) & 0xff) * w
      var hin = 1 // first-row boundary enters block 0 every column
      var b = 0
      while (b < w) {
        val eq0 = peq(c + b)
        val pv = vs(b)
        val mv = vs(vnOff + b)
        val hinNeg = if (hin < 0) 1L else 0L
        val eq = eq0 | hinNeg
        val xv = eq0 | mv
        val xh = (((eq & pv) + pv) ^ pv) | eq
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        if (b == w - 1) {
          if ((ph & lastMask) != 0L) score += 1
          else if ((mh & lastMask) != 0L) score -= 1
        }
        val hout =
          if ((ph & Long.MinValue) != 0L) 1
          else if ((mh & Long.MinValue) != 0L) -1
          else 0
        ph = (ph << 1) | (if (hin > 0) 1L else 0L)
        mh = (mh << 1) | hinNeg
        vs(b) = mh | ~(xv | ph)
        vs(vnOff + b) = ph & xv
        hin = hout
        b += 1
      }
      j += 1
    }
    i = 0
    while (i < m) {
      peq((bt(p, pOff, i) & 0xff) * w + (i >>> 6)) = 0L
      i += 1
    }
    score
  }

  // ----------------------------------------------------------------- jw

  /** Match-flag arrays with generation stamps (flag set iff the entry
    * equals the live generation): avoids the per-call Arrays.fill of
    * l1+l2 flags — ~1 KB of zeroing per pair on long names, pure
    * memory-bandwidth burn that multiplies with threads. Wraps by
    * re-zeroing once every 2^31 calls.
    */
  private final class JwFlags {
    var flags: Array[Int] = new Array[Int](4096)
    var gen: Int = 0
    def next(minLen: Int): Unit = {
      if (flags.length < minLen) {
        flags = new Array[Int](Integer.highestOneBit(minLen) * 2)
        gen = 0
      }
      if (gen == Int.MaxValue) { java.util.Arrays.fill(flags, 0); gen = 0 }
      gen += 1
    }
  }

  private val jwScratch = new ThreadLocal[JwFlags] {
    override def initialValue(): JwFlags = new JwFlags
  }

  /** Per-char position index for the long-string match phase: 257
    * prefix offsets + 256 cursors + s2's positions grouped by char.
    */
  private val jwIndexScratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](513 + 4096)
  }

  /** Jaro-Winkler (similarity/JaroWinklerSimilarity.java:9-110). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    if (a == null || b == null) return 0.0
    if (a.equals(b)) return 1.0
    if (a.numBytes() == 0 || b.numBytes() == 0) return 0.0
    if (!(isAscii(a) && isAscii(b))) {
      return JaroWinkler.similarity(a.toString, b.toString)
    }
    val b1 = a.getBaseObject
    val o1 = a.getBaseOffset
    val b2 = b.getBaseObject
    val o2 = b.getBaseOffset
    val l1 = a.numBytes()
    val l2 = b.numBytes()
    val matchWindow = math.max(0, math.max(l1, l2) / 2 - 1)
    val jw = jwScratch.get()
    jw.next(l1 + l2)
    val scratch = jw.flags
    val gen = jw.gen
    val m1Off = 0
    val m2Off = l1
    var matches = 0
    // Two exact implementations of the same greedy match rule ("first
    // unmatched in-window occurrence of s1(i) in s2"): the classic
    // O(l1 * window) scan, and an O(l1 + l2 + 768) per-char position
    // index for long strings. The index is valid because the window
    // start is nondecreasing in i, so for each char value the candidate
    // positions are consumed strictly left-to-right and a cursor per
    // char never has to back up; positions that fall behind the window
    // are dead forever. Equivalence is property-gated (KernelParitySpec)
    // against the reference String port. The fixed ~768-op index setup
    // only pays for itself past the threshold.
    if (l1.toLong * (2L * matchWindow + 1) <= 4096L) {
      var i = 0
      while (i < l1) {
        val start = math.max(0, i - matchWindow)
        val end = math.min(i + matchWindow + 1, l2)
        var j = start
        var done = false
        while (j < end && !done) {
          if (scratch(m2Off + j) != gen && bt(b1, o1, i) == bt(b2, o2, j)) {
            scratch(m1Off + i) = gen
            scratch(m2Off + j) = gen
            matches += 1
            done = true
          }
          j += 1
        }
        i += 1
      }
    } else {
      val OffBase = 0   // 257 prefix offsets
      val PtrBase = 257 // 256 per-char cursors
      val PosBase = 513
      var ints = jwIndexScratch.get()
      if (ints.length < PosBase + l2) {
        ints = new Array[Int](Integer.highestOneBit(PosBase + l2) * 2)
        jwIndexScratch.set(ints)
      }
      java.util.Arrays.fill(ints, 0, 257, 0)
      var j = 0
      while (j < l2) { ints(OffBase + (bt(b2, o2, j) & 0xff) + 1) += 1; j += 1 }
      var c = 0
      while (c < 256) {
        ints(OffBase + c + 1) += ints(OffBase + c)
        ints(PtrBase + c) = ints(OffBase + c) // fill cursor
        c += 1
      }
      j = 0
      while (j < l2) {
        val ch = bt(b2, o2, j) & 0xff
        ints(PosBase + ints(PtrBase + ch)) = j
        ints(PtrBase + ch) += 1
        j += 1
      }
      c = 0
      while (c < 256) { ints(PtrBase + c) = ints(OffBase + c); c += 1 }
      var i = 0
      while (i < l1) {
        val ch = bt(b1, o1, i) & 0xff
        val start = i - matchWindow // may be negative; positions are >= 0
        val end = math.min(i + matchWindow + 1, l2)
        var k = ints(PtrBase + ch)
        val kEnd = ints(OffBase + ch + 1)
        while (k < kEnd && ints(PosBase + k) < start) k += 1
        ints(PtrBase + ch) = k
        if (k < kEnd) {
          val pj = ints(PosBase + k)
          if (pj < end) {
            scratch(m1Off + i) = gen
            scratch(m2Off + pj) = gen
            matches += 1
            ints(PtrBase + ch) = k + 1
          }
        }
        i += 1
      }
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    var i = 0
    while (i < l1) {
      if (scratch(m1Off + i) == gen) {
        while (scratch(m2Off + k) != gen) k += 1
        if (bt(b1, o1, i) != bt(b2, o2, k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val t = transpositions / 2.0
    val jaro = ((m / l1) + (m / l2) + ((m - t) / m)) / 3.0
    var prefix = 0
    val maxPrefix = math.min(JaroWinkler.MaxPrefixLength, math.min(l1, l2))
    while (prefix < maxPrefix && bt(b1, o1, prefix) == bt(b2, o2, prefix)) prefix += 1
    jaro + prefix * JaroWinkler.DefaultScalingFactor * (1.0 - jaro)
  }

  // ------------------------------------------------------------ jaccard

  /** Open-addressed token tables with GENERATION STAMPS instead of
    * per-call zeroing: a slot is live iff its stamp equals the current
    * call's generation, so the per-pair cost is the ~tokens-inserted
    * writes, not an Arrays.fill of the whole table (8 KB per pair on
    * ~450-char names — pure memory-bandwidth burn that multiplies with
    * threads). The stamp array wraps by re-zeroing once every 2^31
    * generations.
    */
  private final class JacTable {
    var values: Array[Long] = new Array[Long](512)
    var stamps: Array[Int] = new Array[Int](512)
    var gen: Int = 0
    def next(minCap: Int): Unit = {
      if (values.length < minCap) {
        values = new Array[Long](Integer.highestOneBit(minCap) * 2)
        stamps = new Array[Int](values.length)
        gen = 0
      }
      if (gen == Int.MaxValue) {
        java.util.Arrays.fill(stamps, 0)
        gen = 0
      }
      gen += 1
    }
  }

  private val jacScratch = new ThreadLocal[JacTable] {
    override def initialValue(): JacTable = new JacTable
  }

  private def isJavaSpace(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  private def lower(c: Byte): Byte =
    if (c >= 'A' && c <= 'Z') (c + 32).toByte else c

  /** FNV-1a over the lowercased bytes of [from, to). 0 is reserved as the
    * empty-slot marker (remapped).
    */
  private def tokenHash(base: AnyRef, off: Long, from: Int, to: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < to) {
      h ^= lower(bt(base, off, i)) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    if (h == 0L) 0x9e3779b97f4a7c15L else h
  }

  /** Insert into the stamped open-addressed set in `t[off, off+cap)`.
    * A slot is empty unless its stamp equals the live generation.
    * Returns true if newly inserted.
    */
  private def insert(t: JacTable, off: Int, cap: Int, h: Long): Boolean = {
    var idx = ((h ^ (h >>> 32)).toInt & (cap - 1))
    while (true) {
      if (t.stamps(off + idx) != t.gen) {
        t.values(off + idx) = h
        t.stamps(off + idx) = t.gen
        return true
      }
      if (t.values(off + idx) == h) return false
      idx = (idx + 1) & (cap - 1)
    }
    false
  }

  private def contains(t: JacTable, off: Int, cap: Int, h: Long): Boolean = {
    var idx = ((h ^ (h >>> 32)).toInt & (cap - 1))
    while (true) {
      if (t.stamps(off + idx) != t.gen) return false
      if (t.values(off + idx) == h) return true
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
    val aBase = a.getBaseObject
    val aOff = a.getBaseOffset
    val lenA = a.numBytes()
    val bBase = b.getBaseObject
    val bOff = b.getBaseOffset
    val lenB = b.numBytes()
    // worst-case token counts to size the two tables (power of two, 2x)
    def capFor(len: Int): Int = {
      var c = 16
      while (c < len + 2) c <<= 1
      c
    }
    val capA = capFor(lenA / 2 + 1)
    val capB = capFor(lenB / 2 + 1)
    val table = jacScratch.get()
    table.next(capA + capB)
    var sizeA = 0
    var i = 0
    while (i < lenA) {
      while (i < lenA && isJavaSpace(bt(aBase, aOff, i))) i += 1
      val start = i
      while (i < lenA && !isJavaSpace(bt(aBase, aOff, i))) i += 1
      if (i > start && insert(table, 0, capA, tokenHash(aBase, aOff, start, i))) sizeA += 1
    }
    var sizeB = 0
    var inter = 0
    i = 0
    while (i < lenB) {
      while (i < lenB && isJavaSpace(bt(bBase, bOff, i))) i += 1
      val start = i
      while (i < lenB && !isJavaSpace(bt(bBase, bOff, i))) i += 1
      if (i > start) {
        val h = tokenHash(bBase, bOff, start, i)
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
