package graft

import org.scalatest.funsuite.AnyFunSuite

/** The canonical self-hash is the flake-adjudication instrument
  * (VERDICT r8 next #1a): these pin the exact properties RepeatVerify
  * relies on — column-order and row-order insensitivity, -0.0/noise
  * collapsing for doubles, and stability of the rendered forms. */
class CanonSpec extends AnyFunSuite {

  test("canonDouble collapses -0.0, rounds to 9 significant digits") {
    assert(Canon.canonDouble(-0.0) == Canon.canonDouble(0.0))
    // last-bit aggregation-order noise must not flip the hash
    val a = 0.1 + 0.2            // 0.30000000000000004
    val b = 0.3
    assert(Canon.canonDouble(a) == Canon.canonDouble(b))
    assert(Canon.canonDouble(Double.NaN) == "NaN")
    assert(Canon.canonDouble(Double.PositiveInfinity) == "Inf")
    // distinct values beyond noise stay distinct
    assert(Canon.canonDouble(1.0) != Canon.canonDouble(1.0000001))
  }

  test("renderValue: maps sorted, binary hex, decimals trailing-zero-free") {
    assert(Canon.renderValue(Map("b" -> 2, "a" -> 1)) ==
      Canon.renderValue(Map("a" -> 1, "b" -> 2)))
    assert(Canon.renderValue(Array[Byte](0x0a, -1)) == "0x0aff")
    assert(Canon.renderValue(new java.math.BigDecimal("1.2300")) ==
      Canon.renderValue(new java.math.BigDecimal("1.23")))
  }

  test("canonicalLines: row order and column order are irrelevant") {
    val spark = TestSpark.spark
    import spark.implicits._
    val a = Seq((1L, "x", 0.5), (2L, "y", -0.0)).toDF("k", "s", "v")
    val b = Seq((2L, "y", 0.0), (1L, "x", 0.5)).toDF("k", "s", "v")
      .select("v", "k", "s") // permuted columns, reordered rows
    assert(Canon.md5(Canon.canonicalLines(a)) ==
      Canon.md5(Canon.canonicalLines(b)))
    // a VALUE difference must change the hash
    val c = Seq((1L, "x", 0.5), (2L, "y", 1.0)).toDF("k", "s", "v")
    assert(Canon.md5(Canon.canonicalLines(a)) !=
      Canon.md5(Canon.canonicalLines(c)))
  }

  test("nlistFor: √N rule, power-of-two, floored at the gate shape") {
    import graft.operators.Similarity.nlistFor
    assert(nlistFor(0) == 16)
    assert(nlistFor(256) == 16)
    assert(nlistFor(2000) == 64)     // √2000 ≈ 44.7 → 64
    assert(nlistFor(10000) == 128)   // √10000 = 100 → 128
    assert(nlistFor(50000) == 256)   // √50000 ≈ 223.6 → 256
    assert(nlistFor(1000000) == 1024)
    assert(nlistFor(1000000000L) == 32768)
  }
}
