package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.stub.AlpacaStubServer

/** Smoke + shape checks for every SparkEntry query at sf0.001; value
  * parity is proven separately by the DuckDB oracle (scripts/parity.py). */
class QueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = AlpacaStubServer.stop()

  test("every query in the registry has an oracle or is rows-only by design") {
    assert(SparkEntry.queries.nonEmpty)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL declared for every query except known rows-only ops") {
    val rowsOnly = Set("mm_decode_stub")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
