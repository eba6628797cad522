package graft.norm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Golden normalization cases ported from the reference's parameterized
  * tests (rules/NormalizationEngineTest.java:29-90, FIXTURES.md §3.1),
  * checked against BOTH the plain-Scala port and the Column chain.
  */
class NormalizerSpec extends AnyFunSuite {

  test("native normalize expression == built-in regexp_replace chain (property)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(0x0057)
    val alphabet = "abcDEF &.,-_0123456789\t\né中 "
    val corners = Seq("", "   ", "The Acme Corp", "a & b and c", "x  ,  Inc.",
      "dbo.table_v2", "Mr. John Smith Jr.", null,
      // guard adversaries: '$' matches before ONE final line terminator,
      // so a suffix rule must still fire through a trailing \n / \r\n;
      // mixed-case endings exercise the ASCII fold; lone vs doubled
      // spaces pin the collapse guard's identity case
      "Acme Inc\n", "Acme Inc.\r\n", "Beta CO\r", "Gamma gmbH",
      "Delta sA", "The\tCompany", "plain co", "a  b", "a b", "AND",
      "sandwich", "x&y", "data_2024\n", "raw.t_v3\r\n", "Dr No Sr.")
    val rand = (0 until 300).map(_ =>
      (0 until rng.nextInt(60)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = (corners ++ rand).zipWithIndex.map(_.swap).toDF("id", "s")
    for (et <- Seq(Some(Normalizer.COMPANY), Some(Normalizer.PERSON),
        Some(Normalizer.DATASET), None)) {
      val out = df.select(
        Normalizer.normalizeColumn(col("s"), et).as("native"),
        Normalizer.normalizeColumnBuiltins(col("s"), et).as("builtin")).collect()
      out.foreach(r => assert(r.getString(0) == r.getString(1),
        s"type=$et native='${r.getString(0)}' builtin='${r.getString(1)}'"))
    }
  }

  val goldens: Seq[(String, String)] = Seq(
    "Apple Inc." -> "apple",
    "Apple Incorporated" -> "apple",
    "Microsoft Corporation" -> "microsoft",
    "Google LLC" -> "google",
    "Amazon.com Ltd" -> "amazon com",
    "Tesla Company" -> "tesla",
    "Volkswagen AG" -> "volkswagen",
    "Siemens GmbH" -> "siemens",
    "Royal Dutch Shell N.V." -> "royal dutch shell",
    "Unilever B.V." -> "unilever",
    "The Coca Cola" -> "coca cola",
    "Procter & Gamble" -> "procter gamble",
    "Procter and Gamble" -> "procter gamble",
    "Big    Blue" -> "big blue",
    "IBM" -> "ibm",
    // trailing whitespace defeats the $-anchored suffix rule, so "Company"
    // survives — the reference asserts exactly this
    // (NormalizationEngineTest.java testSpaceCollapsing)
    "  Test   Company  " -> "test company",
  )

  test("golden cases (Scala port)") {
    goldens.foreach { case (in, expected) =>
      assert(Normalizer.normalize(in) == expected, s"input '$in'")
    }
  }

  test("golden cases (Column chain) match the Scala port") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = goldens.map(_._1).toDF("name")
      .select(col("name"), Normalizer.normalizeColumn(col("name")).as("norm"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    goldens.foreach { case (in, expected) =>
      assert(got(in) == expected, s"column chain on '$in'")
    }
  }

  test("null/blank handling") {
    assert(Normalizer.normalize(null) == "")
    assert(Normalizer.normalize("   ") == "")
    assert(Normalizer.normalize("") == "")
  }

  test("person rules") {
    assert(Normalizer.normalize("Dr. John Smith Jr.", Some(Normalizer.PERSON)) == "john smith")
    assert(Normalizer.normalize("Mrs. Jane Doe", Some(Normalizer.PERSON)) == "jane doe")
  }

  test("N7 equivalence") {
    assert(Normalizer.areEquivalent("Apple Inc.", "apple incorporated", Some(Normalizer.COMPANY)))
    assert(!Normalizer.areEquivalent("Apple", "Microsoft", Some(Normalizer.COMPANY)))
  }

  test("rule priority is stable: 'and' before ampersand-strip before special chars") {
    // "A and B & C" -> and-rule -> "A B & C" -> ampersand -> "A B C"
    assert(Normalizer.normalize("A and B & C") == "a b c")
  }

  test("guard soundness: guard=false implies replaceAll is identity") {
    // A guard only ever certifies that SKIPPING the rule is safe —
    // whenever it rejects a string, applying the rule must return the
    // string unchanged (either no match, or — for the collapse rule —
    // a match whose replacement is the identity rewrite ' '->' ').
    // Driven over every rule with strings biased toward each rule's own
    // trigger tokens plus line terminators and unicode.
    val rng = new scala.util.Random(0x6A9D)
    val seeds = Seq("inc", "ltd", "co", "corp", "sa", "llc", "plc", "gmbh",
      "ag", "nv", "bv", "the", "and", "&", "mr", "dr", "jr", "sr", "_v2",
      "final", "prod", "2024", "dbo.", "public.", "-", "_", " ", "  ",
      "\t", "\n", "\r\n", "\r", ".", ",", "é", "中", "", " ")
    val samples = (0 until 4000).map { _ =>
      (0 until rng.nextInt(6)).map(_ => seeds(rng.nextInt(seeds.length)))
        .mkString("") match {
        case s if rng.nextBoolean() => s
        case s => s.toUpperCase(java.util.Locale.ROOT)
      }
    } ++ seeds
    var rejected = 0
    for (r <- Normalizer.allRules; s <- samples) {
      if (!r.guard.mayMatch(s)) {
        rejected += 1
        val applied = r.compiled.matcher(s).replaceAll(r.replacement)
        assert(applied == s,
          s"guard of '${r.name}' rejected '$s' but applying '${r.pattern}' changed it to '$applied'")
      }
    }
    assert(rejected > 10000, s"guards never fired (rejected=$rejected) — test is vacuous")
  }
}
