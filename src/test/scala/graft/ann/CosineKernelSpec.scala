package graft.ann

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class CosineKernelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native cosine kernel == HOF formulation bit-exactly (float and double)") {
    val rng = new scala.util.Random(0xc051e)
    val rows = (0 until 300).map { i =>
      val dim = if (i % 7 == 0) 3 else 16
      val a = Seq.fill(dim)((rng.nextFloat() - 0.5f) * 4f)
      val b = i % 11 match {
        case 0 => Seq.fill(dim)(0.0f)            // zero norm -> 0.0
        case 1 => a                              // identical -> 1.0
        case _ => Seq.fill(dim)((rng.nextFloat() - 0.5f) * 4f)
      }
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      Ann.cosine(col("a"), col("b")).as("native"),
      Ann.cosineHof(col("a"), col("b")).as("hof"),
      Ann.cosine(col("a").cast("array<double>"), col("b").cast("array<double>")).as("native_d"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
      assert(r.getDouble(2) == r.getDouble(0), "double-typed input path diverged")
    }
  }

  test("null/length-mismatch semantics match the HOF (null result)") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f, 3.0f))), // length mismatch
      (None, Some(Seq(1.0f))),                              // null side
    ).toDF("a", "b")
    val out = df.select(
      Ann.cosine(col("a"), col("b")).as("native"),
      Ann.cosineHof(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      assert(r.isNullAt(0), "mismatch/null must yield null")
    }
  }
}
