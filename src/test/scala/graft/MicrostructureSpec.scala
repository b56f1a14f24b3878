package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Microstructure

/** Hostile-series equivalence proof for the bucketed Lee–Ready core:
  * the gate fixture never exercises zero-tick runs that cross bucket
  * boundaries (its prices strictly walk), so this spec drives both
  * cores over series built to hit every carry path — constant-price
  * runs spanning buckets (entry_r), trades before any quote
  * (unclassified + tick-only), quote-less buckets (entry_mid), and
  * empty buckets — at bucket widths down to one row per bucket
  * (maximal boundary stress) and up to one bucket total (degenerate =
  * plain). Bit-identical output required at every width. */
class MicrostructureSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (symbol, t_us, price8, size): AAA holds a constant-price run over
  // many would-be buckets after a single up-tick (its zero-tick carry
  // must survive arbitrarily many boundaries), then a down-tick;
  // BBB's first trades precede any quote and never change price
  // (unclassified run); CCC trades exactly AT the mid (quote rule
  // silent everywhere — pure tick classification).
  private val trades = Seq(
    ("AAA", 1000L, 800L, 10L), ("AAA", 2000L, 801L, 10L),
    ("AAA", 3000L, 801L, 10L), ("AAA", 4000L, 801L, 10L),
    ("AAA", 9000L, 801L, 10L), ("AAA", 15000L, 801L, 20L),
    ("AAA", 21000L, 800L, 30L),
    ("BBB", 500L, 400L, 5L), ("BBB", 1500L, 400L, 5L),
    ("BBB", 2500L, 400L, 5L),
    ("CCC", 1000L, 600L, 7L), ("CCC", 5000L, 600L, 7L),
    ("CCC", 9000L, 602L, 7L), ("CCC", 13000L, 602L, 7L))

  // (symbol, t_us, mid8): AAA quoted from the start; BBB's first quote
  // arrives only at 2000 (trades before it fall to the tick rule —
  // price never changes, so they stay unclassified); CCC's mid tracks
  // the trade price exactly (qdir = 0 on every print).
  private val quotes = Seq(
    ("AAA", 1000L, 800L), ("AAA", 8000L, 802L), ("AAA", 20000L, 801L),
    ("BBB", 2000L, 399L),
    ("CCC", 1000L, 600L), ("CCC", 8000L, 602L))

  test("bucketed Lee-Ready core == plain core on hostile series, all widths") {
    val t = trades.toDF("symbol", "t_us", "price8", "size")
    val q = quotes.toDF("symbol", "t_us", "mid8")
    val expected = Microstructure.leeReadyCore(t, q).collect().toSeq
    assert(expected.nonEmpty)
    // 1µs: every row its own bucket; primes stress unaligned
    // boundaries; 1_000_000µs: a single bucket (degenerate = plain)
    for (w <- Seq(1L, 7L, 999L, 4001L, 30000L, 1000000L)) {
      val got = Microstructure.leeReadyBucketedCore(t, q, w).collect().toSeq
      assert(got == expected, s"bucket width $w diverged:\n$got\nvs\n$expected")
    }
  }

  test("markout core: pre-quote and at-mid prints excluded, decomposition exact") {
    val t = Seq(
      ("AAA", 500L, 802L, 1L),  // before any quote -> excluded
      ("AAA", 2000L, 802L, 1L), // buy above mid 800; fwd mid 804
      ("AAA", 4000L, 804L, 1L), // exactly at the (same-instant) mid -> excluded
      ("AAA", 5000L, 800L, 1L), // sell below mid 804; fwd mid 810
      ("BBB", 1000L, 505L, 1L), // pre-quote -> excluded
      ("BBB", 4000L, 500L, 1L)  // at mid -> excluded; BBB emits NO row
    ).toDF("symbol", "t_us", "price8", "size")
    val q = Seq(("AAA", 1000L, 800L), ("AAA", 4000L, 804L),
      ("AAA", 9000L, 810L), ("BBB", 3000L, 500L))
      .toDF("symbol", "t_us", "mid8")
    val rows = Microstructure.markoutCore(t, q, 5000L).collect()
    assert(rows.length == 1 && rows.head.getString(0) == "AAA")
    val r = rows.head
    assert(r.getAs[Long]("n_trades") == 2L)
    assert(r.getAs[Long]("eff2_sum") == 12L)     // 4 + 8
    assert(r.getAs[Long]("real2_sum") == 16L)    // -4 + 20
    assert(r.getAs[Long]("impact2_sum") == -4L)  // 8 - 12
    assert(r.getAs[Double]("avg_eff_spread") == 0.75)
    assert(r.getAs[Double]("avg_realized_spread") == 1.0)
    assert(r.getAs[Double]("avg_price_impact") == -0.25)
  }

  test("streaming tick rule: restart mid-stream carries state, exactly-once") {
    import org.apache.spark.sql.functions._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tick_ckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_tick_sink").toString
    def run(end: String): Unit = {
      val q = Microstructure.tickRuleStream(spark, end)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    // half-day (2 micro-batches at 6h steps), then restart extending to
    // the full day — the first print after the restart must classify
    // against the CHECKPOINTED (lastPrice, lastDir), not from scratch
    run("2021-01-04T12:00:00Z")
    run("2021-01-05T00:00:00Z")
    val got = spark.read.parquet(sink)
      .select(col("symbol"), col("t_us"), col("dir"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    // exactly-once across the restart
    assert(got.map(x => (x._1, x._2)).distinct.length == got.length)
    // batch ground truth over the full day through the same connector
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("symbol")).orderBy(col("t_us"))
    val expected = Microstructure.lrTradesForSpec(spark, "2021-01-05T00:00:00Z")
      .withColumn("tick",
        signum(col("price8") - lag(col("price8"), 1).over(w)).cast("int"))
      .withColumn("dir", coalesce(
        last(nullif(col("tick"), lit(0)), ignoreNulls = true)
          .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)), lit(0)))
      .select(col("symbol"), col("t_us"), col("dir"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    assert(expected.nonEmpty && got.toSeq == expected.toSeq)
  }

  test("plain core classifies the hostile series as designed") {
    val t = trades.toDF("symbol", "t_us", "price8", "size")
    val q = quotes.toDF("symbol", "t_us", "mid8")
    val rows = Microstructure.leeReadyCore(t, q).collect()
      .map(r => r.getString(0) -> r).toMap
    // BBB: constant price, first trades unquoted -> tick rule never
    // fires, the quoted trade at 2500 is above mid 399 -> one buy
    assert(rows("BBB").getAs[Long]("buy_volume") == 5L)
    assert(rows("BBB").getAs[Long]("n_unclassified") == 2L)
    // CCC: every print at the mid -> all classification via tick rule
    assert(rows("CCC").getAs[Long]("n_quote_rule") == 0L)
    assert(rows("CCC").getAs[Long]("n_tick_fallback") >= 2L)
  }
}
