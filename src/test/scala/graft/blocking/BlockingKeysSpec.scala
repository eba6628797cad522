package graft.blocking

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Blocking-key shape goldens ported from
  * similarity/BlockingKeyStrategyTest.java:22-100 (FIXTURES.md §3.3),
  * checked against both the Scala mirror and the Column expression.
  */
class BlockingKeysSpec extends AnyFunSuite {

  val goldens: Seq[(String, Set[String])] = Seq(
    "microsoft corporation" -> Set("pfx:mic", "tok:corporation|microsoft", "bg:mi"),
    "microsoft" -> Set("pfx:mic", "tok:microsoft", "bg:mi"),
    "ab" -> Set("pfx:ab", "tok:ab", "bg:ab"),
    "a" -> Set("pfx:a", "tok:a", "bg:a"),
    "" -> Set.empty[String],
    "   " -> Set.empty[String],
  )

  test("golden key shapes (Scala)") {
    goldens.foreach { case (in, expected) =>
      assert(BlockingKeys.defaultKeysScala(in).toSet == expected, s"input '$in'")
    }
    assert(BlockingKeys.defaultKeysScala(null).isEmpty)
  }

  test("case-insensitive: MICROSOFT == microsoft") {
    assert(BlockingKeys.defaultKeysScala("MICROSOFT") ==
      BlockingKeys.defaultKeysScala("microsoft"))
  }

  test("Column expression matches Scala mirror") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // incl. whitespace adversaries: Spark trim strips SPACES only and
    // split keeps trailing empties — the mirror must reproduce exactly
    // what the engine does, garbage keys for whitespace-only included
    val inputs = goldens.map(_._1) ++ Seq("Zebra Alpha", "one two three four",
      "acme\t", "\t", " x ", "a  b", "x y")
    val got = inputs.toDF("name")
      .select(col("name"), BlockingKeys.defaultKeys(col("name")).as("keys"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet)
      .toMap
    inputs.foreach { in =>
      assert(got(in) == BlockingKeys.defaultKeysScala(in).toSet, s"parity on '$in'")
    }
  }

  test("mirror matches engine under a tr-TR default locale (non-ASCII slow path)") {
    // UTF8String.toLowerCase: ASCII fast path, else default-locale
    // String.toLowerCase — so on a tr-TR JVM the ENGINE emits dotless-i
    // keys for non-ASCII names containing 'I'. The mirror must follow the
    // engine, not Locale.ROOT. (ASCII-only names never hit the slow path
    // and stay locale-agnostic in both.)
    val spark = SparkTestSession.spark
    import spark.implicits._
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val inputs = Seq("IŞIK LTD", "İstanbul AŞ", "PLAIN ASCII INC", "Ümit I")
      val got = inputs.toDF("name")
        .select(col("name"), BlockingKeys.defaultKeys(col("name")).as("keys"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toSet)
        .toMap
      inputs.foreach { in =>
        assert(got(in) == BlockingKeys.defaultKeysScala(in).toSet, s"parity on '$in'")
      }
      // the slow path really engaged: tr lowercasing of non-ASCII 'IŞIK'
      // yields dotless ı, so the prefix key differs from the ROOT form
      assert(got("IŞIK LTD").contains("pfx:ış" + "ı"))
    } finally java.util.Locale.setDefault(prev)
  }

  test("sorted-token key handles reordered names") {
    // 'tok:' key is identical under token reorder (ADR-001 rationale)
    val a = BlockingKeys.defaultKeysScala("alpha beta").filter(_.startsWith("tok:"))
    val b = BlockingKeys.defaultKeysScala("beta alpha").filter(_.startsWith("tok:"))
    assert(a == b && a == Seq("tok:alpha|beta"))
  }

  test("minhash signature is deterministic and collision-sane") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq("the quick brown fox", "the quick brown fox", "a completely different doc")
      .toDF("t")
      .withColumn("sh", BlockingKeys.shingleHashes(col("t")))
      .withColumn("sig", BlockingKeys.minhashSignatureFromHashes(col("sh")))
    val sigs = df.collect().map(_.getSeq[Long](2))
    assert(sigs(0) == sigs(1), "identical text -> identical signature")
    assert(sigs(0) != sigs(2), "different text -> different signature")
    assert(sigs(0).length == BlockingKeys.NumHashes)
  }

  test("minhash band keys: identical docs share all bands") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val keys = BlockingKeys.minhashKeyTable(
      Seq((1L, "hello world of spark"), (2L, "hello world of spark")).toDF("id", "t"),
      "id", col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byKey = keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byKey.size == BlockingKeys.Bands)
    assert(byKey.values.forall(_ == Set(1L, 2L)))
  }

  test("native minhash kernel == staged HOF plan (property, 500 random strings)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rng = new scala.util.Random(0xbadc0de)
    val alphabet = "abcdefghijklmnopqrstuvwxyz 0123456789.&-"
    val strs = (0 until 500).map { i =>
      val len = i % 3 match {
        case 0 => 1 + rng.nextInt(2)      // shorter than a shingle
        case 1 => 3 + rng.nextInt(20)     // short
        case _ => 100 + rng.nextInt(400)  // corpus-shaped
      }
      (i.toLong, (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }
    val df = strs.toDF("id", "t")
    val native = BlockingKeys.minhashKeyTable(df, "id", col("t"))
      .as[(String, Long)].collect().toSet
    val hof = BlockingKeys.minhashKeyTableHof(df, "id", col("t"))
      .as[(String, Long)].collect().toSet
    assert(native == hof, "native kernel must emit exactly the HOF band keys")
    assert(native.nonEmpty)
  }

  test("native simhash60 kernel == staged HOF plan (property, 400 random strings)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // includes a supplementary-plane char (👍): Spark's ascii() is
    // code-point-based (probed: 128077), so the HOF rolling hash and the
    // kernel's codePoints() walk agree even beyond the BMP
    val alphabet = "abcXYZ 09\t  zzéü世" + new String(Character.toChars(0x1F44D))
    val strs = (1 to 400).map { _ =>
      val n = rng.nextInt(60)
      (1 to n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    } ++ Seq("", "   ", "\t\n", "ONE two THREE", "café CAFÉ")
    val df = strs.toDF("t")
    val toks = filter(split(lower(col("t")), "\\s+"), x => length(x) > 0)
    val rows = df.select(
      BlockingKeys.simhash60(col("t")).as("native"),
      BlockingKeys.simhash60FromHashes(
        BlockingKeys.tokenHashes(toks), BlockingKeys.tokenHashes2(toks)).as("hof"))
      .collect()
    rows.zip(strs).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1),
        s"native != HOF for ${s.take(40)}: ${r.getLong(0)} vs ${r.getLong(1)}")
    }
  }

  test("simhash: near-identical docs have small hamming distance") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val toks = filter(split(lower(col("t")), "\\s+"), x => length(x) > 0)
    val out = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the lazy cat again and again",
      "entirely unrelated words describing some other topic completely")
      .toDF("t")
      .withColumn("th", BlockingKeys.tokenHashes(toks))
      .select(BlockingKeys.simhashFromHashes(col("th")))
      .collect().map(_.getLong(0))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(out(0), out(1)) < hamming(out(0), out(2)))
  }

  test("sorted-neighborhood pairs: adjacent in sort order") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1L, "aaa"), (2L, "aab"), (3L, "zzz")).toDF("id", "name")
    val pairs = BlockingKeys.sortedNeighborhoodPairs(df, "id", "name", windowSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)))
  }
}
