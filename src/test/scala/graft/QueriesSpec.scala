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

  test("oracle SQL declared for every query (no rows-only ops remain)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("sim_ann_ivfpq_persisted reproduces the in-memory build bit-exactly") {
    // doubles round-trip parquet exactly and the query-side structures
    // are computed with the build's own expressions, so the persisted
    // probe must equal the in-memory prod gate to the last bit — no
    // tolerance (both also share the DuckDB oracle; this pins the
    // Spark-vs-Spark identity directly)
    val mem = SparkEntry.queries("sim_ann_ivfpq_768_prod")(spark, dir)
      .collect().toSeq
    val per = SparkEntry.queries("sim_ann_ivfpq_persisted")(spark, dir)
      .collect().toSeq
    assert(mem == per)
  }

  test("bars⋈trades flagship shuffles on (symbol, hour-bucket), not symbol alone") {
    val df = operators.AlpacaQueries.barsTradesJoin(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val keys = "(?:SortMergeJoin|ShuffledHashJoin) \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(keys.split(",").length >= 2,
      s"compound shuffle key expected, got [$keys] in:\n$plan")
  }
}
