package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** The native codegen'd kernels must agree bit-exactly with the
  * interpreted HOF folds they replaced — same left-associated IEEE
  * order — on random data, edge shapes, and nulls, in BOTH codegen
  * and interpreted (eval) execution. */
class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("DotProductF ≡ aggregate(zip_with(...)) bit-exactly; MatchCountF ≡ HOF count") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      val dim = Seq(0, 1, 3, 64, 128)(i % 5)
      (Array.fill(dim)(rng.nextFloat() * 2 - 1),
        Array.fill(dim)(rng.nextFloat() * 2 - 1),
        Array.fill(16)(rng.nextInt(4).toLong),
        Array.fill(16)(rng.nextInt(4).toLong))
    }
    val df = rows.toDF("a", "b", "sa", "sb")
    val hofDot = expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val hofCnt = expr("aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
    val out = df.select(
      dotF($"a", $"b").as("nd"), hofDot.as("hd"),
      matchCountF($"sa", $"sb").as("nc"), hofCnt.as("hc")).collect()
    out.foreach { r =>
      // bit-exact, not approximate: same fold order must give same bits
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(r.getInt(2) == r.getInt(3))
    }

    // null array → null result (both kernels)
    val withNull = Seq((Array(1.0f, 2.0f), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(dotF($"a", $"b").as("d"))
    assert(withNull.collect().head.isNullAt(0))

    // interpreted path (eval, no codegen) must agree too
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val out2 = df.select(dotF($"a", $"b").as("nd"), hofDot.as("hd")).collect()
      out2.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
