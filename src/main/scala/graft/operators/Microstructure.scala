package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.stub.AlpacaFixtures

/** Cross-batch tick-rule state: the last trade price and the standing
  * nonzero direction — the two values the zero-tick rule carries. */
case class TickState(lastPrice: Long, lastDir: Int)

/** Per-trade streaming classification row (dir 0 = not yet classified,
  * projected to NULL at readback to match the batch rule). */
case class TickOut(symbol: String, t_us: Long, price8: Long, size: Long,
    dir: Int)

/**
 * Market-microstructure analytics over the connector sources — the
 * research workloads a quote/trade feed exists to power (the reference
 * ships the sources, `stocks/trades.py` / `stocks/quotes.py`, and
 * leaves the microstructure layer to users). Every estimator keeps its
 * moments as EXACT integers on the fixture's dyadic price grids
 * (price8 = 8ths, mid8 = 8ths from a 4ths midpoint sum, amount4 =
 * 4ths) and spends at most a handful of IEEE operations, applied in
 * the same order by both engines, at the very end — parity is
 * structural, never a tolerance.
 *
 * Scale shapes (the recurring ones, noted per-gate below):
 *  - prevailing-quote attachment is the tag-union + one-window LOCF
 *    form (see AsofJoin.scala) — never a range join;
 *  - per-symbol serial statistics are lag()/window passes on ONE
 *    (symbol) clustering, then partial-aggregable integer sums;
 *  - tiny reference relations (a benchmark series, the dividend
 *    calendar) broadcast because they are BOUNDED — per-symbol×day
 *    rows, never corpus-sized.
 */
object Microstructure {
  import AlpacaQueries.{baseOptions, us, fmtTs, sqlStr, fmtD}

  private val Hour = AlpacaFixtures.HourUs
  private val Day = AlpacaFixtures.DayUs

  private val msSymbols = Seq("AAPL", "MSFT")
  private val msStart = "2021-01-04T00:00:00Z"
  private val msEnd = "2021-01-05T00:00:00Z"
  private val quotesEnd = "2021-01-04T06:00:00Z"

  // ------------------------------------------------ Lee–Ready (quote rule)
  /** Lee–Ready trade classification — the full algorithm, not just the
    * tick test (`alpaca_tick_rule` is the fallback half): each trade
    * is compared to the prevailing quote midpoint (strictly above →
    * BUY, strictly below → SELL); trades AT the midpoint — where the
    * quote rule is silent — fall back to the tick rule (sign of the
    * last nonzero price change). Trades before any quote also fall to
    * the tick rule, the standard practical choice.
    *
    * Scale shape: quotes attach by the tag-union + one-window LOCF
    * form (one shuffle on symbol, never a range join); the tick
    * fallback is two more window passes on the SAME clustering; the
    * final per-symbol flow aggregate is partial-aggregable integer
    * sums. At 100 TB of prints this costs exactly one symbol-keyed
    * exchange. Imbalance is one IEEE division of exact BIGINTs. */
  /** Connector-read inputs shared by the plain and bucketed forms:
    * trades(symbol, t_us, price8, size) / quotes(symbol, t_us, mid8). */
  private def lrTrades(spark: SparkSession): DataFrame =
    lrTradesForSpec(spark, quotesEnd)

  /** Batch trade projection with a caller-chosen end (spec ground
    * truth for the streaming restart case). */
  private[graft] def lrTradesForSpec(spark: SparkSession, endIso: String): DataFrame =
    spark.read.format("Alpaca_Stocks_Trades")
      .options(baseOptions(msSymbols: _*) ++ Map(
        "start" -> msStart, "end" -> endIso))
      .load()
      .select(col("symbol"), unix_micros(col("time")).as("t_us"),
        round(col("price") * 8).cast("long").as("price8"), col("size"))

  private def lrQuotes(spark: SparkSession): DataFrame =
    spark.read.format("Alpaca_Stocks_Quotes")
      .options(baseOptions(msSymbols: _*) ++ Map(
        "start" -> msStart, "end" -> quotesEnd))
      .load()
      .select(col("symbol"), unix_micros(col("time")).as("t_us"),
        round((col("bid_price") + col("ask_price")) * 4).cast("long").as("mid8"))

  /** Tick + standing-direction columns — the zero-tick idiom shared
    * by Kyle's lambda, VPIN, and the crypto accuracy gate: tick =
    * sign of the price change vs the previous print; dir = last
    * nonzero tick carried forward (NULL until the first change). One
    * symbol-clustered window pair. */
  private def withTickDir(df: DataFrame, priceCol: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("t_us"))
    df.withColumn("tick",
        signum(col(priceCol) - lag(col(priceCol), 1).over(w)).cast("int"))
      .withColumn("dir", last(nullif(col("tick"), lit(0)), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def leeReady(spark: SparkSession, dir: String): DataFrame =
    leeReadyCore(lrTrades(spark), lrQuotes(spark))

  /** Core over prepared trades(symbol, t_us, price8, size) and
    * quotes(symbol, t_us, mid8). Exposed for MicrostructureSpec's
    * hostile-series equivalence proof against the bucketed core.
    * Determinism contract (as the as-of family): instants unique per
    * symbol within each relation. */
  private[graft] def leeReadyCore(tradesIn: DataFrame, quotesIn: DataFrame): DataFrame = {
    val trades = tradesIn.select(col("symbol"), col("t_us"), col("price8"),
      col("size"), lit(1).as("is_trade"), lit(null).cast("long").as("q_mid8"))
    val quotes = quotesIn.select(col("symbol"), col("t_us"),
      lit(null).cast("long").as("price8"), lit(null).cast("long").as("size"),
      lit(0).as("is_trade"), col("mid8").as("q_mid8"))
    val wUnion = Window.partitionBy(col("symbol"))
      .orderBy(col("t_us"), col("is_trade"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTrades = Window.partitionBy(col("symbol")).orderBy(col("t_us"))
    val wCarry = wTrades.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trades.unionByName(quotes)
      .withColumn("mid8", last(col("q_mid8"), ignoreNulls = true).over(wUnion))
      .filter(col("is_trade") === 1)
      .withColumn("tick",
        signum(col("price8") - lag(col("price8"), 1).over(wTrades)).cast("int"))
      .withColumn("tdir",
        last(nullif(col("tick"), lit(0)), ignoreNulls = true).over(wCarry))
      .withColumn("qdir",
        when(col("mid8").isNotNull,
          signum(col("price8") - col("mid8")).cast("int")))
      .withColumn("lr_dir",
        when(col("qdir").isNotNull && col("qdir") =!= 0, col("qdir"))
          .otherwise(col("tdir")))
      .groupBy(col("symbol"))
      .agg(
        sum(when(col("lr_dir") === 1, col("size")).otherwise(0L)).as("buy_volume"),
        sum(when(col("lr_dir") === -1, col("size")).otherwise(0L)).as("sell_volume"),
        count(when(col("lr_dir") === 1, 1)).as("n_buys"),
        count(when(col("lr_dir") === -1, 1)).as("n_sells"),
        count(when(col("qdir").isNotNull && col("qdir") =!= 0, 1)).as("n_quote_rule"),
        count(when((col("qdir").isNull || col("qdir") === 0) &&
          col("lr_dir").isNotNull, 1)).as("n_tick_fallback"),
        count(when(col("lr_dir").isNull, 1)).as("n_unclassified"))
      .withColumn("imbalance",
        (col("buy_volume") - col("sell_volume")).cast("double") /
          (col("buy_volume") + col("sell_volume")).cast("double"))
      .orderBy(col("symbol"))
  }

  def leeReadySql: String = {
    val tRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.trades(s, us(msStart), us(quotesEnd))
    }.map { t =>
      s"(${sqlStr(t.symbol)}, ${t.timeUs}, ${math.round(t.price * 8)}, ${t.size})"
    }
    val qRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.stockQuotes(s, us(msStart), us(quotesEnd))
    }.map { qt =>
      s"(${sqlStr(qt.symbol)}, ${qt.timeUs}, " +
        s"${math.round((qt.bidPrice + qt.askPrice) * 4)})"
    }
    s"""WITH t(symbol, t_us, price8, size) AS (VALUES ${tRows.mkString(",\n  ")}),
       |q(symbol, t_us, mid8) AS (VALUES ${qRows.mkString(",\n  ")}),
       |j AS (
       |  SELECT t.symbol, t.t_us, t.price8, t.size, q.mid8
       |  FROM t ASOF LEFT JOIN q
       |    ON t.symbol = q.symbol AND t.t_us >= q.t_us),
       |ticked AS (
       |  SELECT *, CAST(SIGN(price8 - LAG(price8) OVER w) AS INTEGER) AS tick
       |  FROM j WINDOW w AS (PARTITION BY symbol ORDER BY t_us)),
       |classified AS (
       |  SELECT symbol, size,
       |    CASE WHEN mid8 IS NOT NULL
       |      THEN CAST(SIGN(price8 - mid8) AS INTEGER) END AS qdir,
       |    LAST_VALUE(NULLIF(tick, 0) IGNORE NULLS) OVER (
       |      PARTITION BY symbol ORDER BY t_us
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tdir
       |  FROM ticked),
       |dirs AS (
       |  SELECT symbol, size, qdir,
       |    CASE WHEN qdir IS NOT NULL AND qdir <> 0 THEN qdir ELSE tdir END
       |      AS lr_dir
       |  FROM classified)
       |SELECT symbol,
       |  CAST(SUM(CASE WHEN lr_dir = 1 THEN size ELSE 0 END) AS BIGINT)
       |    AS buy_volume,
       |  CAST(SUM(CASE WHEN lr_dir = -1 THEN size ELSE 0 END) AS BIGINT)
       |    AS sell_volume,
       |  COUNT(CASE WHEN lr_dir = 1 THEN 1 END) AS n_buys,
       |  COUNT(CASE WHEN lr_dir = -1 THEN 1 END) AS n_sells,
       |  COUNT(CASE WHEN qdir IS NOT NULL AND qdir <> 0 THEN 1 END)
       |    AS n_quote_rule,
       |  COUNT(CASE WHEN (qdir IS NULL OR qdir = 0) AND lr_dir IS NOT NULL
       |    THEN 1 END) AS n_tick_fallback,
       |  COUNT(CASE WHEN lr_dir IS NULL THEN 1 END) AS n_unclassified,
       |  CAST(SUM(CASE WHEN lr_dir = 1 THEN size ELSE 0 END) -
       |       SUM(CASE WHEN lr_dir = -1 THEN size ELSE 0 END) AS DOUBLE) /
       |  CAST(SUM(CASE WHEN lr_dir = 1 THEN size ELSE 0 END) +
       |       SUM(CASE WHEN lr_dir = -1 THEN size ELSE 0 END) AS DOUBLE)
       |    AS imbalance
       |FROM dirs GROUP BY symbol ORDER BY symbol""".stripMargin
  }

  /** Hot-symbol SCALE twin of [[leeReady]] (same seed-spine technique
    * as `asof_join_bucketed` / `alpaca_effective_spread_bucketed`,
    * proven portable to a THREE-carry operator): all windows run per
    * (symbol, 2-hour bucket) so one symbol's print stream
    * parallelizes across buckets instead of serializing through one
    * task. Three values cross the bucket boundary, each resolved on
    * the tiny (symbol × bucket) spine with one LOCF apiece:
    *   1. the prevailing quote mid (entry_mid — as in the as-of twin);
    *   2. the previous trade PRICE (prevp — the first in-bucket trade's
    *      tick needs it);
    *   3. the standing tick DIRECTION (entry_r): per bucket, the last
    *      in-bucket price change, or failing that the boundary change
    *      vs the prior bucket's last price — coalesce of the two is
    *      the bucket's "direction event", and LOCF over those events
    *      is exactly the last-price-change recursion, linearized.
    * In-bucket, the previous-trade price is last(price8 ignoreNulls)
    * over the EXCLUSIVE preceding frame (lag() would trip over
    * interleaved quote rows). Shares [[leeReadySql]] with the plain
    * form — the two implementations cross-prove each other against
    * one DuckDB oracle. */
  def leeReadyBucketed(spark: SparkSession, dir: String): DataFrame =
    leeReadyBucketedCore(lrTrades(spark), lrQuotes(spark), 2L * Hour)

  /** Bucketed core over the same prepared inputs as [[leeReadyCore]];
    * `bucketUs` is the time-bucket width (hostile spec drives it down
    * to one row per bucket — maximal boundary stress). */
  private[graft] def leeReadyBucketedCore(tradesIn: DataFrame,
      quotesIn: DataFrame, bucketUs: Long): DataFrame = {
    val W = bucketUs
    val trades = tradesIn.select(col("symbol"), col("t_us"), col("price8"),
      col("size"), lit(1).as("is_trade"), lit(null).cast("long").as("q_mid8"))
    val quotes = quotesIn.select(col("symbol"), col("t_us"),
      lit(null).cast("long").as("price8"), lit(null).cast("long").as("size"),
      lit(0).as("is_trade"), col("mid8").as("q_mid8"))
    val rows = trades.unionByName(quotes)
      // floor division (pre-1970-safe, same as the as-of twins)
      .withColumn("b", expr(s"(t_us - pmod(t_us, ${W}L)) DIV ${W}L"))
      // NOT a null guard (t_us is non-null by contract): the explicit
      // IsNotNull on the SHARED subtree keeps both join consumers'
      // pushed filters identical — the inferred join-key filter pushes
      // past the windows on one branch only, which breaks exchange
      // canonical equality and resurrects the second connector scan
      // (the asof_join_bucketed device)
      .filter(col("b").isNotNull)
    // `size` joins the ordering as a never-reached tiebreak ((t_us,
    // is_trade) is already unique per the determinism contract): it is
    // the one base column the join-back branch needs and the spine
    // branch doesn't, and unequal pruning below the shared shuffle
    // would break exchange canonical equality and resurrect a second
    // scan of BOTH connector sources (the asof_join_bucketed trick)
    val wB = Window.partitionBy(col("symbol"), col("b"))
      .orderBy(col("t_us"), col("is_trade"), col("size"))
    val full = wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val toCur = wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pass1 = rows
      .withColumn("prevp_in", last(col("price8"), ignoreNulls = true)
        .over(wB.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("tick_in", when(col("is_trade") === 1,
        nullif(signum(col("price8") - col("prevp_in")).cast("int"), lit(0))))
      .withColumn("in_mid", last(col("q_mid8"), ignoreNulls = true).over(toCur))
      .withColumn("local_d", last(col("tick_in"), ignoreNulls = true).over(full))
      .withColumn("bucket_mid", last(col("q_mid8"), ignoreNulls = true).over(full))
      .withColumn("firstp", first(col("price8"), ignoreNulls = true).over(full))
      .withColumn("lastp", last(col("price8"), ignoreNulls = true).over(full))
      .withColumn("rn", row_number().over(wB))
    val wPrior = Window.partitionBy(col("symbol")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = pass1.filter(col("rn") === 1)
      .select(col("symbol"), col("b"), col("bucket_mid"), col("firstp"),
        col("lastp"), col("local_d"))
      .withColumn("entry_mid", last(col("bucket_mid"), ignoreNulls = true).over(wPrior))
      .withColumn("prevp", last(col("lastp"), ignoreNulls = true).over(wPrior))
      .withColumn("e", coalesce(col("local_d"),
        nullif(signum(col("firstp") - col("prevp")).cast("int"), lit(0))))
      .withColumn("entry_r", last(col("e"), ignoreNulls = true).over(wPrior))
      .select(col("symbol"), col("b"), col("entry_mid"), col("prevp"),
        col("entry_r"))
    // merge-pinned: the spine is |symbols|×|buckets| — linear in the
    // corpus, never broadcastable at scale
    pass1.join(spine.hint("merge"), Seq("symbol", "b"))
      .withColumn("tick_full", when(col("is_trade") === 1,
        nullif(signum(col("price8") -
          coalesce(col("prevp_in"), col("prevp"))).cast("int"), lit(0))))
      .withColumn("in_d", last(col("tick_full"), ignoreNulls = true).over(toCur))
      .filter(col("is_trade") === 1)
      .withColumn("mid", coalesce(col("in_mid"), col("entry_mid")))
      .withColumn("qdir", when(col("mid").isNotNull,
        signum(col("price8") - col("mid")).cast("int")))
      .withColumn("lr_dir",
        when(col("qdir").isNotNull && col("qdir") =!= 0, col("qdir"))
          .otherwise(coalesce(col("in_d"), col("entry_r"))))
      .groupBy(col("symbol"))
      .agg(
        sum(when(col("lr_dir") === 1, col("size")).otherwise(0L)).as("buy_volume"),
        sum(when(col("lr_dir") === -1, col("size")).otherwise(0L)).as("sell_volume"),
        count(when(col("lr_dir") === 1, 1)).as("n_buys"),
        count(when(col("lr_dir") === -1, 1)).as("n_sells"),
        count(when(col("qdir").isNotNull && col("qdir") =!= 0, 1)).as("n_quote_rule"),
        count(when((col("qdir").isNull || col("qdir") === 0) &&
          col("lr_dir").isNotNull, 1)).as("n_tick_fallback"),
        count(when(col("lr_dir").isNull, 1)).as("n_unclassified"))
      .withColumn("imbalance",
        (col("buy_volume") - col("sell_volume")).cast("double") /
          (col("buy_volume") + col("sell_volume")).cast("double"))
      .orderBy(col("symbol"))
  }

  // ------------------------------------------------ Kyle's lambda
  private val KyleIntervalUs = 1800L * 1000000L

  /** Kyle's lambda — the price-impact slope: regress the 30-minute
    * change in quote midpoint on the interval's signed (tick-rule)
    * order flow; λ = cov(Δmid, q)/var(q), kept exact as BIGINT moment
    * combinations with ONE final IEEE division. The interval mid is
    * the LAST quote mid in the interval (max_by on the unique quote
    * instant — deterministic in both engines).
    *
    * Scale shape: the tick rule costs its one symbol exchange; both
    * interval aggregations are partial-aggregable and land on
    * (symbol, interval) keys; the interval join and the Δmid lag act
    * on |symbols|×|intervals| rows — orders of magnitude below the
    * print volume; the final moments are partial-aggregable sums. */
  def kyleLambda(spark: SparkSession, dir: String): DataFrame = {
    val flow = withTickDir(lrTrades(spark), "price8")
      .filter(col("dir").isNotNull)
      .withColumn("iv", expr(s"t_us DIV ${KyleIntervalUs}L"))
      .groupBy(col("symbol"), col("iv"))
      .agg(sum(col("dir") * col("size")).as("q"))
    val mids = lrQuotes(spark)
      .withColumn("iv", expr(s"t_us DIV ${KyleIntervalUs}L"))
      .groupBy(col("symbol"), col("iv"))
      .agg(max_by(col("mid8"), col("t_us")).as("mid_end"))
    val wIv = Window.partitionBy(col("symbol")).orderBy(col("iv"))
    flow.join(mids, Seq("symbol", "iv"))
      .withColumn("dm", col("mid_end") - lag(col("mid_end"), 1).over(wIv))
      .filter(col("dm").isNotNull)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dm") * col("q")).as("sxy"),
        sum(col("dm")).as("sx"), sum(col("q")).as("sy"),
        sum(col("q") * col("q")).as("syy"))
      .withColumn("lambda_num", col("n_intervals") * col("sxy") - col("sx") * col("sy"))
      .withColumn("lambda_den", col("n_intervals") * col("syy") - col("sy") * col("sy"))
      .select(col("symbol"), col("n_intervals"), col("lambda_num"),
        col("lambda_den"),
        (col("lambda_num").cast("double") / col("lambda_den").cast("double"))
          .as("kyle_lambda"))
      .orderBy(col("symbol"))
  }

  def kyleLambdaSql: String = {
    val tRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.trades(s, us(msStart), us(quotesEnd))
    }.map { t =>
      s"(${sqlStr(t.symbol)}, ${t.timeUs}, ${math.round(t.price * 8)}, ${t.size})"
    }
    val qRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.stockQuotes(s, us(msStart), us(quotesEnd))
    }.map { qt =>
      s"(${sqlStr(qt.symbol)}, ${qt.timeUs}, " +
        s"${math.round((qt.bidPrice + qt.askPrice) * 4)})"
    }
    s"""WITH t(symbol, t_us, price8, size) AS (VALUES ${tRows.mkString(",\n  ")}),
       |q(symbol, t_us, mid8) AS (VALUES ${qRows.mkString(",\n  ")}),
       |ticked AS (
       |  SELECT symbol, t_us, size,
       |    CAST(SIGN(price8 - LAG(price8) OVER (
       |      PARTITION BY symbol ORDER BY t_us)) AS INTEGER) AS tick
       |  FROM t),
       |classified AS (
       |  SELECT symbol, t_us, size,
       |    LAST_VALUE(NULLIF(tick, 0) IGNORE NULLS) OVER (
       |      PARTITION BY symbol ORDER BY t_us
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dir
       |  FROM ticked),
       |flow AS (
       |  SELECT symbol, t_us // $KyleIntervalUs AS iv, SUM(dir * size) AS fq
       |  FROM classified WHERE dir IS NOT NULL GROUP BY 1, 2),
       |mids AS (
       |  SELECT symbol, t_us // $KyleIntervalUs AS iv,
       |    MAX_BY(mid8, t_us) AS mid_end
       |  FROM q GROUP BY 1, 2),
       |iv AS (
       |  SELECT f.symbol, f.iv,
       |    m.mid_end - LAG(m.mid_end) OVER (
       |      PARTITION BY f.symbol ORDER BY f.iv) AS dm,
       |    f.fq
       |  FROM flow f JOIN mids m ON f.symbol = m.symbol AND f.iv = m.iv),
       |m AS (
       |  SELECT symbol, COUNT(*) AS n_intervals, SUM(dm * fq) AS sxy,
       |    SUM(dm) AS sx, SUM(fq) AS sy, SUM(fq * fq) AS syy
       |  FROM iv WHERE dm IS NOT NULL GROUP BY symbol)
       |SELECT symbol, n_intervals,
       |  CAST(n_intervals * sxy - sx * sy AS BIGINT) AS lambda_num,
       |  CAST(n_intervals * syy - sy * sy AS BIGINT) AS lambda_den,
       |  CAST(n_intervals * sxy - sx * sy AS DOUBLE) /
       |    CAST(n_intervals * syy - sy * sy AS DOUBLE) AS kyle_lambda
       |FROM m ORDER BY symbol""".stripMargin
  }

  // ------------------------------------------------ VPIN toxicity buckets
  private val VpinBucketVol = 2000L

  /** VPIN volume buckets — order-flow toxicity: classified volume
    * fills fixed-size volume buckets (V = $VpinBucketVol shares); per
    * bucket, the absolute buy/sell imbalance is the toxicity series
    * feeding VPIN. A whole trade lands in the bucket its PRE-trade
    * cumulative volume falls in (the common discrete simplification
    * of Easley–López de Prado–O'Hara's split-fill; documented, both
    * engines identical). Pre-classification prints (no tick direction
    * yet) are excluded before bucketing.
    *
    * Scale shape: one symbol exchange for tick rule + exclusive-frame
    * cumulative volume; the bucket aggregation is partial-aggregable
    * BIGINT sums on (symbol, bucket) keys. The cumulative sum is the
    * one genuinely serial pass — per symbol, like every running-total
    * in the book (alpaca_obv, drawdown); a hot symbol splits by the
    * same seed-spine technique as leeReadyBucketed if it ever walls. */
  def vpin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("t_us"))
    withTickDir(lrTradesForSpec(spark, msEnd), "price8")
      .filter(col("dir").isNotNull)
      .withColumn("cum", coalesce(sum(col("size"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bucket", expr(s"cum DIV ${VpinBucketVol}L"))
      .groupBy(col("symbol"), col("bucket"))
      .agg(
        sum(when(col("dir") === 1, col("size")).otherwise(0L)).as("buy_volume"),
        sum(when(col("dir") === -1, col("size")).otherwise(0L)).as("sell_volume"))
      .select(col("symbol"), col("bucket"), col("buy_volume"), col("sell_volume"),
        abs(col("buy_volume") - col("sell_volume")).as("abs_imbalance"),
        (col("buy_volume") + col("sell_volume")).as("bucket_volume"))
      .orderBy(col("symbol"), col("bucket"))
  }

  def vpinSql: String = {
    val rows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.trades(s, us(msStart), us(msEnd))
    }.map { t =>
      s"(${sqlStr(t.symbol)}, ${t.timeUs}, ${math.round(t.price * 8)}, ${t.size})"
    }
    s"""WITH t(symbol, t_us, price8, size) AS (VALUES ${rows.mkString(",\n  ")}),
       |ticked AS (
       |  SELECT symbol, t_us, size,
       |    CAST(SIGN(price8 - LAG(price8) OVER (
       |      PARTITION BY symbol ORDER BY t_us)) AS INTEGER) AS tick
       |  FROM t),
       |classified AS (
       |  SELECT symbol, t_us, size,
       |    LAST_VALUE(NULLIF(tick, 0) IGNORE NULLS) OVER (
       |      PARTITION BY symbol ORDER BY t_us
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dir
       |  FROM ticked),
       |cummed AS (
       |  SELECT symbol, size, dir,
       |    COALESCE(SUM(size) OVER (
       |      PARTITION BY symbol ORDER BY t_us
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM classified WHERE dir IS NOT NULL),
       |b AS (
       |  SELECT symbol, CAST(cum // $VpinBucketVol AS BIGINT) AS bucket,
       |    SUM(CASE WHEN dir = 1 THEN size ELSE 0 END) AS buy_volume,
       |    SUM(CASE WHEN dir = -1 THEN size ELSE 0 END) AS sell_volume
       |  FROM cummed GROUP BY 1, 2)
       |SELECT symbol, bucket,
       |  CAST(buy_volume AS BIGINT) AS buy_volume,
       |  CAST(sell_volume AS BIGINT) AS sell_volume,
       |  CAST(ABS(buy_volume - sell_volume) AS BIGINT) AS abs_imbalance,
       |  CAST(buy_volume + sell_volume AS BIGINT) AS bucket_volume
       |FROM b ORDER BY symbol, bucket""".stripMargin
  }

  // ------------------------------------------------ Roll implied spread
  /** Roll's implied-spread estimator: s = 2·√(−cov(Δpₜ, Δpₜ₊₁)) when
    * the serial covariance of successive price changes is negative
    * (bid-ask bounce), else 0. The covariance never leaves integer
    * space: with Δ on the 1/8 grid, cov·n² = n·Σxy − Σx·Σy is an
    * exact BIGINT; the estimator is then three IEEE ops (divide,
    * sqrt, scale by the exact power-of-two 2/8).
    *
    * Scale shape: one symbol-keyed shuffle, two lag() passes on that
    * clustering, then partial-aggregable sums — identical cost
    * profile to the tick rule at any corpus size. */
  def rollSpread(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("t_us"))
    lrTradesForSpec(spark, msEnd)
      .withColumn("d", col("price8") - lag(col("price8"), 1).over(w))
      .withColumn("x", lag(col("d"), 1).over(w))
      .filter(col("d").isNotNull && col("x").isNotNull)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x") * col("d")).as("sxy"),
        sum(col("x")).as("sx"), sum(col("d")).as("sy"))
      .withColumn("cov_num",
        col("n_pairs") * col("sxy") - col("sx") * col("sy"))
      .withColumn("roll_spread",
        when(col("cov_num") < 0,
          lit(2.0) * sqrt((-col("cov_num")).cast("double") /
            (col("n_pairs") * col("n_pairs")).cast("double")) / lit(8.0))
          .otherwise(lit(0.0)))
      .select(col("symbol"), col("n_pairs"), col("cov_num"), col("roll_spread"))
      .orderBy(col("symbol"))
  }

  def rollSpreadSql: String = {
    val rows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.trades(s, us(msStart), us(msEnd))
    }.map { t =>
      s"(${sqlStr(t.symbol)}, ${t.timeUs}, ${math.round(t.price * 8)})"
    }
    s"""WITH tr(symbol, t_us, price8) AS (VALUES ${rows.mkString(",\n  ")}),
       |d1 AS (
       |  SELECT symbol, t_us,
       |    price8 - LAG(price8) OVER w AS d
       |  FROM tr WINDOW w AS (PARTITION BY symbol ORDER BY t_us)),
       |pairs AS (
       |  SELECT symbol, LAG(d) OVER w AS x, d
       |  FROM d1 WINDOW w AS (PARTITION BY symbol ORDER BY t_us)),
       |m AS (
       |  SELECT symbol, COUNT(*) AS n_pairs,
       |    SUM(x * d) AS sxy, SUM(x) AS sx, SUM(d) AS sy
       |  FROM pairs WHERE d IS NOT NULL AND x IS NOT NULL
       |  GROUP BY symbol)
       |SELECT symbol, n_pairs,
       |  CAST(n_pairs * sxy - sx * sy AS BIGINT) AS cov_num,
       |  CASE WHEN n_pairs * sxy - sx * sy < 0
       |    THEN 2.0 * SQRT(CAST(-(n_pairs * sxy - sx * sy) AS DOUBLE) /
       |      CAST(n_pairs * n_pairs AS DOUBLE)) / 8.0
       |    ELSE 0.0 END AS roll_spread
       |FROM m ORDER BY symbol""".stripMargin
  }

  // ------------------------------------------------ streaming tick rule
  /** Streaming tick-rule classification — the per-print incremental
    * twin of `alpaca_tick_rule`, and the pattern every stateful
    * market-data stream reduces to: `flatMapGroupsWithState` keyed by
    * symbol, whose state is EXACTLY the values the batch window
    * carries (last price, standing nonzero direction), so micro-batch
    * boundaries are invisible in the output — the drained stream
    * matches the batch per-print classification row-for-row against
    * one DuckDB oracle.
    *
    * Scale notes: state is one (long, int) pair per symbol — bounded
    * by symbol cardinality, independent of print volume; input
    * shuffles once on symbol, the same key the batch form windows on.
    * Within a micro-batch the group iterator's order is undefined, so
    * the handler sorts its batch slice by instant — bounded by
    * per-symbol-per-trigger volume, the quantity a real deployment
    * already bounds via trigger intervals. */
  /** The classified stream pre-drain — parameterized end so
    * MicrostructureSpec can run it checkpointed across a restart. */
  private[graft] def tickRuleStream(spark: SparkSession, endIso: String): DataFrame = {
    import spark.implicits._
    val stream = spark.readStream.format("Alpaca_Stocks_Trades")
      .options(baseOptions(msSymbols: _*) ++ Map(
        "start" -> msStart, "end" -> endIso, "stream_step" -> "6Hours"))
      .load()
      .select(col("symbol"), unix_micros(col("time")).as("t_us"),
        round(col("price") * 8).cast("long").as("price8"), col("size"))
      .as[(String, Long, Long, Long)]
    stream.groupByKey(_._1)
      .flatMapGroupsWithState[TickState, TickOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, rows, state) =>
        val sorted = rows.toArray.sortBy(_._2)
        var st = state.getOption.getOrElse(TickState(Long.MinValue, 0))
        val out = sorted.map { case (s, t, p, sz) =>
          val tick =
            if (st.lastPrice == Long.MinValue) 0
            else java.lang.Long.signum(p - st.lastPrice)
          val d = if (tick != 0) tick else st.lastDir
          st = TickState(p, d)
          TickOut(s, t, p, sz, d)
        }
        state.update(st)
        out.iterator
      }.toDF()
  }

  def streamTickRule(spark: SparkSession, dir: String): DataFrame = {
    Streaming.drainToTable(spark, tickRuleStream(spark, msEnd), "append")
      .select(col("symbol"), col("t_us"), col("price8"), col("size"),
        nullif(col("dir"), lit(0)).as("dir"))
      .orderBy(col("symbol"), col("t_us"))
  }

  def streamTickRuleSql: String = {
    val rows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.trades(s, us(msStart), us(msEnd))
    }.map { t =>
      s"(${sqlStr(t.symbol)}, ${t.timeUs}, ${math.round(t.price * 8)}, ${t.size})"
    }
    s"""WITH tr(symbol, t_us, price8, size) AS (VALUES ${rows.mkString(",\n  ")}),
       |ticked AS (
       |  SELECT symbol, t_us, price8, size,
       |    CAST(SIGN(price8 - LAG(price8) OVER (
       |      PARTITION BY symbol ORDER BY t_us)) AS INTEGER) AS tick
       |  FROM tr)
       |SELECT symbol, t_us, price8, size,
       |  LAST_VALUE(NULLIF(tick, 0) IGNORE NULLS) OVER (
       |    PARTITION BY symbol ORDER BY t_us
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dir
       |FROM ticked ORDER BY symbol, t_us""".stripMargin
  }

  // ------------------------------------------- tick-rule validation (crypto)
  private val ctaSymbols = Seq("BTC/USD", "ETH/USD")

  /** Tick-rule accuracy scored against ground truth — the validation
    * study the crypto feed uniquely enables: its prints carry the TRUE
    * aggressor (`taker_side`), so classifying them with the tick rule
    * and diffing against the label measures how much to trust
    * inferred order flow on the equity feed (which has no label).
    * Emits the per-symbol confusion counts and accuracy; volumes stay
    * exact via size4 BIGINTs (crypto sizes are fractional doubles on
    * the 0.25 grid — summing them raw would be shuffle-order-
    * dependent).
    *
    * Scale shape: identical to the tick rule — one symbol-keyed
    * exchange, two window passes on that clustering, partial-
    * aggregable counts. */
  def cryptoTickAccuracy(spark: SparkSession, dir: String): DataFrame = {
    val trades = spark.read.format("Alpaca_Crypto_Trades")
      .options(baseOptions(ctaSymbols: _*) ++ Map(
        "start" -> msStart, "end" -> msEnd))
      .load()
      .select(col("symbol"), unix_micros(col("time")).as("t_us"),
        round(col("price") * 4).cast("long").as("price4"),
        round(col("size") * 4).cast("long").as("size4"), col("taker_side"))
    withTickDir(trades, "price4")
      .withColumn("pred_side",
        when(col("dir") === 1, "B").when(col("dir") === -1, "S"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_trades"),
        count(col("pred_side")).as("n_classified"),
        count(when(col("pred_side") === col("taker_side"), 1)).as("n_correct"),
        count(when(col("pred_side") === "B" && col("taker_side") === "S", 1))
          .as("n_false_buys"),
        count(when(col("pred_side") === "S" && col("taker_side") === "B", 1))
          .as("n_false_sells"),
        sum(when(col("pred_side") === col("taker_side"), col("size4"))
          .otherwise(0L)).as("correct_vol4"))
      .withColumn("accuracy",
        col("n_correct").cast("double") / col("n_classified").cast("double"))
      .orderBy(col("symbol"))
  }

  def cryptoTickAccuracySql: String = {
    val rows = ctaSymbols.sorted.flatMap { s =>
      AlpacaFixtures.cryptoTrades(s, us(msStart), us(msEnd))
    }.map { t =>
      s"(${sqlStr(t.symbol)}, ${t.timeUs}, ${math.round(t.price * 4)}, " +
        s"${math.round(t.size * 4)}, ${sqlStr(t.takerSide)})"
    }
    s"""WITH tr(symbol, t_us, price4, size4, taker_side) AS
       |  (VALUES ${rows.mkString(",\n  ")}),
       |ticked AS (
       |  SELECT symbol, t_us, size4, taker_side,
       |    CAST(SIGN(price4 - LAG(price4) OVER (
       |      PARTITION BY symbol ORDER BY t_us)) AS INTEGER) AS tick
       |  FROM tr),
       |classified AS (
       |  SELECT symbol, size4, taker_side,
       |    CASE LAST_VALUE(NULLIF(tick, 0) IGNORE NULLS) OVER (
       |      PARTITION BY symbol ORDER BY t_us
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      WHEN 1 THEN 'B' WHEN -1 THEN 'S' END AS pred_side
       |  FROM ticked)
       |SELECT symbol, COUNT(*) AS n_trades,
       |  COUNT(pred_side) AS n_classified,
       |  COUNT(CASE WHEN pred_side = taker_side THEN 1 END) AS n_correct,
       |  COUNT(CASE WHEN pred_side = 'B' AND taker_side = 'S' THEN 1 END)
       |    AS n_false_buys,
       |  COUNT(CASE WHEN pred_side = 'S' AND taker_side = 'B' THEN 1 END)
       |    AS n_false_sells,
       |  CAST(SUM(CASE WHEN pred_side = taker_side THEN size4 ELSE 0 END)
       |    AS BIGINT) AS correct_vol4,
       |  CAST(COUNT(CASE WHEN pred_side = taker_side THEN 1 END) AS DOUBLE) /
       |    CAST(COUNT(pred_side) AS DOUBLE) AS accuracy
       |FROM classified GROUP BY symbol ORDER BY symbol""".stripMargin
  }

  // ------------------------------------------------ markout decomposition
  private val MarkoutUs = 300L * 1000000L

  /** Markout (effective → realized → impact) spread decomposition —
    * the execution-quality report TCA desks run: per trade, the
    * prevailing mid at t AND at t+5min, giving effective spread
    * 2·dir·(p−mid_t), realized spread 2·dir·(p−mid_{t+5}), and price
    * impact (their difference). dir is the quote rule (at-mid prints
    * excluded — no tick fallback here, so the decomposition is pure).
    *
    * Scale shape — BOTH mids from ONE window pass: each trade
    * explodes into two evaluation instants (t and t+H) that ride the
    * same quotes-union LOCF the as-of family uses, then fold back by
    * trade key with conditional max — quotes are scanned ONCE and no
    * range join exists (the naive formulation is two as-of joins =
    * two quote scans). Moments stay BIGINT on the 1/8 grid; the
    * per-symbol averages are two IEEE divisions each, fixed order. */
  def markout(spark: SparkSession, dir: String): DataFrame =
    markoutCore(lrTrades(spark), lrQuotes(spark), MarkoutUs)

  /** Core over prepared trades(symbol, t_us, price8, size) and
    * quotes(symbol, t_us, mid8); exposed for MicrostructureSpec's
    * hostile-path cases (pre-quote trades, at-mid prints). */
  private[graft] def markoutCore(tradesIn: DataFrame, quotesIn: DataFrame,
      horizonUs: Long): DataFrame = {
    val evals = tradesIn
      .select(col("symbol"), col("t_us"), col("price8"),
        explode(array(
          struct(col("t_us").as("eval_us"), lit(1).as("kind")),
          struct((col("t_us") + lit(horizonUs)).as("eval_us"), lit(2).as("kind"))
        )).as("ev"))
      .select(col("symbol"), col("t_us"), col("price8"),
        col("ev.eval_us").as("eval_us"), col("ev.kind").as("kind"),
        lit(1).as("is_eval"), lit(null).cast("long").as("q_mid8"))
    val quotes = quotesIn
      .select(col("symbol"), lit(null).cast("long").as("t_us"),
        lit(null).cast("long").as("price8"),
        col("t_us").as("eval_us"), lit(0).as("kind"),
        lit(0).as("is_eval"), col("mid8").as("q_mid8"))
    val w = Window.partitionBy(col("symbol"))
      .orderBy(col("eval_us"), col("is_eval"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evals.unionByName(quotes)
      .withColumn("mid8", last(col("q_mid8"), ignoreNulls = true).over(w))
      .filter(col("is_eval") === 1)
      .groupBy(col("symbol"), col("t_us"), col("price8"))
      .agg(max(when(col("kind") === 1, col("mid8"))).as("mid_at"),
        max(when(col("kind") === 2, col("mid8"))).as("mid_fwd"))
      .filter(col("mid_at").isNotNull && col("mid_fwd").isNotNull)
      .withColumn("tdir", signum(col("price8") - col("mid_at")).cast("long"))
      .filter(col("tdir") =!= 0)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_trades"),
        sum(col("tdir") * (col("price8") - col("mid_at")) * 2).as("eff2_sum"),
        sum(col("tdir") * (col("price8") - col("mid_fwd")) * 2).as("real2_sum"),
        sum(col("tdir") * (col("mid_fwd") - col("mid_at")) * 2).as("impact2_sum"))
      .select(col("symbol"), col("n_trades"),
        col("eff2_sum"), col("real2_sum"), col("impact2_sum"),
        (col("eff2_sum").cast("double") / col("n_trades").cast("double") / lit(8.0))
          .as("avg_eff_spread"),
        (col("real2_sum").cast("double") / col("n_trades").cast("double") / lit(8.0))
          .as("avg_realized_spread"),
        (col("impact2_sum").cast("double") / col("n_trades").cast("double") / lit(8.0))
          .as("avg_price_impact"))
      .orderBy(col("symbol"))
  }

  private val MarkoutHorizons = Seq(60L, 300L, 1800L).map(_ * 1000000L)

  /** Multi-horizon markout — the full TCA curve (1min / 5min / 30min)
    * proving the single-window claim by construction: k horizons are
    * k extra array elements in the SAME explode, riding the SAME
    * quotes-union LOCF window and the same per-trade fold-back; a
    * second explode pivots the folded mids into per-horizon rows.
    * Plan cost vs the single-horizon gate: identical shape — one data
    * exchange, one window, two Generates — regardless of k. The
    * oracle runs k independent DuckDB ASOF joins, one per horizon. */
  def markoutMulti(spark: SparkSession, dir: String): DataFrame =
    markoutMultiCore(lrTrades(spark), lrQuotes(spark), MarkoutHorizons)

  private[graft] def markoutMultiCore(tradesIn: DataFrame, quotesIn: DataFrame,
      horizons: Seq[Long]): DataFrame = {
    val evalStructs =
      struct(col("t_us").as("eval_us"), lit(0).as("kind")) +:
        horizons.zipWithIndex.map { case (h, i) =>
          struct((col("t_us") + lit(h)).as("eval_us"), lit(i + 1).as("kind"))
        }
    val evals = tradesIn
      .select(col("symbol"), col("t_us"), col("price8"),
        explode(array(evalStructs: _*)).as("ev"))
      .select(col("symbol"), col("t_us"), col("price8"),
        col("ev.eval_us").as("eval_us"), col("ev.kind").as("kind"),
        lit(1).as("is_eval"), lit(null).cast("long").as("q_mid8"))
    val quotes = quotesIn
      .select(col("symbol"), lit(null).cast("long").as("t_us"),
        lit(null).cast("long").as("price8"),
        col("t_us").as("eval_us"), lit(0).as("kind"),
        lit(0).as("is_eval"), col("mid8").as("q_mid8"))
    val w = Window.partitionBy(col("symbol"))
      .orderBy(col("eval_us"), col("is_eval"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val folded = evals.unionByName(quotes)
      .withColumn("mid8", last(col("q_mid8"), ignoreNulls = true).over(w))
      .filter(col("is_eval") === 1)
      .groupBy(col("symbol"), col("t_us"), col("price8"))
      .agg(max(when(col("kind") === 0, col("mid8"))).as("mid_at"),
        array(horizons.indices.map { i =>
          struct(lit(horizons(i)).as("horizon_us"),
            max(when(col("kind") === i + 1, col("mid8"))).as("mid_fwd"))
        }: _*).as("fwd"))
      .filter(col("mid_at").isNotNull)
      .withColumn("tdir", signum(col("price8") - col("mid_at")).cast("long"))
      .filter(col("tdir") =!= 0)
      .select(col("symbol"), col("price8"), col("mid_at"), col("tdir"),
        explode(col("fwd")).as("f"))
      .select(col("symbol"), col("price8"), col("mid_at"), col("tdir"),
        col("f.horizon_us").as("horizon_us"), col("f.mid_fwd").as("mid_fwd"))
      .filter(col("mid_fwd").isNotNull)
    folded.groupBy(col("symbol"), col("horizon_us"))
      .agg(count(lit(1)).as("n_trades"),
        sum(col("tdir") * (col("price8") - col("mid_at")) * 2).as("eff2_sum"),
        sum(col("tdir") * (col("price8") - col("mid_fwd")) * 2).as("real2_sum"),
        sum(col("tdir") * (col("mid_fwd") - col("mid_at")) * 2).as("impact2_sum"))
      .select(col("symbol"), col("horizon_us"), col("n_trades"),
        col("eff2_sum"), col("real2_sum"), col("impact2_sum"),
        (col("real2_sum").cast("double") / col("n_trades").cast("double") / lit(8.0))
          .as("avg_realized_spread"),
        (col("impact2_sum").cast("double") / col("n_trades").cast("double") / lit(8.0))
          .as("avg_price_impact"))
      .orderBy(col("symbol"), col("horizon_us"))
  }

  def markoutMultiSql: String = {
    val tRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.trades(s, us(msStart), us(quotesEnd))
    }.map { t =>
      s"(${sqlStr(t.symbol)}, ${t.timeUs}, ${math.round(t.price * 8)})"
    }
    val qRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.stockQuotes(s, us(msStart), us(quotesEnd))
    }.map { qt =>
      s"(${sqlStr(qt.symbol)}, ${qt.timeUs}, " +
        s"${math.round((qt.bidPrice + qt.askPrice) * 4)})"
    }
    val fwdCtes = MarkoutHorizons.zipWithIndex.map { case (h, i) =>
      s"""fwd$i AS (
         |  SELECT t.symbol, t.t_us, q.mid8 AS mid_fwd
         |  FROM t ASOF LEFT JOIN q
         |    ON t.symbol = q.symbol AND t.t_us + $h >= q.t_us)""".stripMargin
    }.mkString(",\n")
    val unions = MarkoutHorizons.zipWithIndex.map { case (h, i) =>
      s"""  SELECT a.symbol, CAST($h AS BIGINT) AS horizon_us, a.price8,
         |    a.mid_at, f.mid_fwd
         |  FROM at_t a JOIN fwd$i f ON a.symbol = f.symbol AND a.t_us = f.t_us""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH t(symbol, t_us, price8) AS (VALUES ${tRows.mkString(",\n  ")}),
       |q(symbol, t_us, mid8) AS (VALUES ${qRows.mkString(",\n  ")}),
       |at_t AS (
       |  SELECT t.symbol, t.t_us, t.price8, q.mid8 AS mid_at
       |  FROM t ASOF LEFT JOIN q
       |    ON t.symbol = q.symbol AND t.t_us >= q.t_us),
       |$fwdCtes,
       |u AS (
       |$unions),
       |j AS (
       |  SELECT symbol, horizon_us, price8, mid_at, mid_fwd,
       |    CAST(SIGN(price8 - mid_at) AS BIGINT) AS tdir
       |  FROM u
       |  WHERE mid_at IS NOT NULL AND mid_fwd IS NOT NULL
       |    AND price8 <> mid_at)
       |SELECT symbol, horizon_us, COUNT(*) AS n_trades,
       |  CAST(SUM(tdir * (price8 - mid_at) * 2) AS BIGINT) AS eff2_sum,
       |  CAST(SUM(tdir * (price8 - mid_fwd) * 2) AS BIGINT) AS real2_sum,
       |  CAST(SUM(tdir * (mid_fwd - mid_at) * 2) AS BIGINT) AS impact2_sum,
       |  CAST(SUM(tdir * (price8 - mid_fwd) * 2) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) / 8.0 AS avg_realized_spread,
       |  CAST(SUM(tdir * (mid_fwd - mid_at) * 2) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) / 8.0 AS avg_price_impact
       |FROM j GROUP BY symbol, horizon_us
       |ORDER BY symbol, horizon_us""".stripMargin
  }

  def markoutSql: String = {
    val tRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.trades(s, us(msStart), us(quotesEnd))
    }.map { t =>
      s"(${sqlStr(t.symbol)}, ${t.timeUs}, ${math.round(t.price * 8)})"
    }
    val qRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.stockQuotes(s, us(msStart), us(quotesEnd))
    }.map { qt =>
      s"(${sqlStr(qt.symbol)}, ${qt.timeUs}, " +
        s"${math.round((qt.bidPrice + qt.askPrice) * 4)})"
    }
    s"""WITH t(symbol, t_us, price8) AS (VALUES ${tRows.mkString(",\n  ")}),
       |q(symbol, t_us, mid8) AS (VALUES ${qRows.mkString(",\n  ")}),
       |at_t AS (
       |  SELECT t.symbol, t.t_us, t.price8, q.mid8 AS mid_at
       |  FROM t ASOF LEFT JOIN q
       |    ON t.symbol = q.symbol AND t.t_us >= q.t_us),
       |fwd AS (
       |  SELECT t.symbol, t.t_us, q.mid8 AS mid_fwd
       |  FROM t ASOF LEFT JOIN q
       |    ON t.symbol = q.symbol AND t.t_us + $MarkoutUs >= q.t_us),
       |j AS (
       |  SELECT a.symbol, a.price8, a.mid_at, f.mid_fwd,
       |    CAST(SIGN(a.price8 - a.mid_at) AS BIGINT) AS tdir
       |  FROM at_t a JOIN fwd f ON a.symbol = f.symbol AND a.t_us = f.t_us
       |  WHERE a.mid_at IS NOT NULL AND f.mid_fwd IS NOT NULL
       |    AND a.price8 <> a.mid_at)
       |SELECT symbol, COUNT(*) AS n_trades,
       |  CAST(SUM(tdir * (price8 - mid_at) * 2) AS BIGINT) AS eff2_sum,
       |  CAST(SUM(tdir * (price8 - mid_fwd) * 2) AS BIGINT) AS real2_sum,
       |  CAST(SUM(tdir * (mid_fwd - mid_at) * 2) AS BIGINT) AS impact2_sum,
       |  CAST(SUM(tdir * (price8 - mid_at) * 2) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) / 8.0 AS avg_eff_spread,
       |  CAST(SUM(tdir * (price8 - mid_fwd) * 2) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) / 8.0 AS avg_realized_spread,
       |  CAST(SUM(tdir * (mid_fwd - mid_at) * 2) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) / 8.0 AS avg_price_impact
       |FROM j GROUP BY symbol ORDER BY symbol""".stripMargin
  }

  // ------------------------------------------------ variance ratio
  private val VrQ = 4

  /** Lo–MacKinlay variance ratio VR(q): Var(q-period Δclose) /
    * (q·Var(1-period Δclose)) over hourly bars — the standard
    * random-walk/microstructure-noise diagnostic (VR < 1 ⇒ mean
    * reversion ⇒ bid-ask bounce). Both variances use overlapping
    * differences and stay EXACT: n·Σd² − (Σd)² as BIGINTs from ONE
    * window pass (lag 1 and lag q share the symbol clustering) and
    * ONE conditional aggregate; the ratio is four IEEE ops in fixed
    * order. */
  def varianceRatio(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    spark.read.format("Alpaca_Stocks_Bars")
      .options(baseOptions(msSymbols: _*) ++ Map(
        "timeframe" -> "1Hour", "start" -> msStart, "end" -> betaEnd))
      .load()
      .select(col("symbol"), col("time"),
        round(col("close") * 8).cast("long").as("close8"))
      .withColumn("d1", col("close8") - lag(col("close8"), 1).over(w))
      .withColumn("dq", col("close8") - lag(col("close8"), VrQ).over(w))
      .groupBy(col("symbol"))
      .agg(count(col("d1")).as("n1"),
        sum(col("d1")).as("s1"), sum(col("d1") * col("d1")).as("s11"),
        count(col("dq")).as("nq"),
        sum(col("dq")).as("sq"), sum(col("dq") * col("dq")).as("sqq"))
      .withColumn("v1_num", col("n1") * col("s11") - col("s1") * col("s1"))
      .withColumn("vq_num", col("nq") * col("sqq") - col("sq") * col("sq"))
      .select(col("symbol"), col("n1"), col("nq"), col("v1_num"), col("vq_num"),
        ((col("vq_num").cast("double") / (col("nq") * col("nq")).cast("double")) /
          (lit(VrQ.toDouble) *
            (col("v1_num").cast("double") / (col("n1") * col("n1")).cast("double"))))
          .as("variance_ratio"))
      .orderBy(col("symbol"))
  }

  def varianceRatioSql: String = {
    val rows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.bars(s, us(msStart), us(betaEnd), Hour)
    }.map { b =>
      s"(${sqlStr(b.symbol)}, ${b.timeUs}, ${math.round(b.close * 8)})"
    }
    s"""WITH bars(symbol, t_us, close8) AS (VALUES ${rows.mkString(",\n  ")}),
       |d AS (
       |  SELECT symbol,
       |    close8 - LAG(close8, 1) OVER w AS d1,
       |    close8 - LAG(close8, $VrQ) OVER w AS dq
       |  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY t_us)),
       |m AS (
       |  SELECT symbol, COUNT(d1) AS n1, SUM(d1) AS s1, SUM(d1 * d1) AS s11,
       |    COUNT(dq) AS nq, SUM(dq) AS sq, SUM(dq * dq) AS sqq
       |  FROM d GROUP BY symbol)
       |SELECT symbol, n1, nq,
       |  CAST(n1 * s11 - s1 * s1 AS BIGINT) AS v1_num,
       |  CAST(nq * sqq - sq * sq AS BIGINT) AS vq_num,
       |  (CAST(nq * sqq - sq * sq AS DOUBLE) / CAST(nq * nq AS DOUBLE)) /
       |    ($VrQ.0 * (CAST(n1 * s11 - s1 * s1 AS DOUBLE) /
       |      CAST(n1 * n1 AS DOUBLE))) AS variance_ratio
       |FROM m ORDER BY symbol""".stripMargin
  }

  // ------------------------------------------------ Amihud illiquidity
  private val amStart = "2021-01-04T00:00:00Z"
  private val amEnd = "2021-02-03T00:00:00Z"

  /** Amihud per-day illiquidity: |Δclose| / dollar volume, ×10⁶ — the
    * standard price-impact proxy, emitted per (symbol, day) so every
    * row is independently exact (a cross-day average would sum
    * doubles in nondeterministic order; consumers aggregate the
    * per-day series however they like). |Δclose8| is an exact BIGINT
    * on the 1/8 grid; dollar volume vwap4·volume an exact BIGINT on
    * the 1/4 grid; the ratio is four IEEE ops in a fixed order.
    *
    * Scale shape: daily bars are already tiny relative to ticks, one
    * symbol window for the lag, no joins. */
  def amihud(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    spark.read.format("Alpaca_Stocks_Bars")
      .options(baseOptions(msSymbols: _*) ++ Map(
        "timeframe" -> "1Day", "start" -> amStart, "end" -> amEnd))
      .load()
      .select(col("symbol"), col("time"),
        round(col("close") * 8).cast("long").as("close8"),
        round(col("vwap") * 4).cast("long").as("vwap4"), col("volume"))
      .withColumn("abs_d8",
        abs(col("close8") - lag(col("close8"), 1).over(w)))
      .filter(col("abs_d8").isNotNull)
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd").as("day"),
        col("abs_d8"),
        (col("vwap4") * col("volume")).as("dollar_vol4"),
        ((col("abs_d8").cast("double") / lit(8.0)) * lit(1000000.0) /
          ((col("vwap4") * col("volume")).cast("double") / lit(4.0)))
          .as("illiq_e6"))
      .orderBy(col("symbol"), col("day"))
  }

  def amihudSql: String = {
    val rows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.bars(s, us(amStart), us(amEnd), Day)
    }.map { b =>
      s"(${sqlStr(b.symbol)}, ${sqlStr(fmtTs(b.timeUs).take(10))}, " +
        s"${math.round(b.close * 8)}, ${math.round(b.vwap * 4)}, ${b.volume})"
    }
    s"""WITH bars(symbol, day, close8, vwap4, volume) AS
       |  (VALUES ${rows.mkString(",\n  ")}),
       |d AS (
       |  SELECT symbol, day,
       |    ABS(close8 - LAG(close8) OVER (
       |      PARTITION BY symbol ORDER BY day)) AS abs_d8,
       |    vwap4 * volume AS dollar_vol4
       |  FROM bars)
       |SELECT symbol, day, CAST(abs_d8 AS BIGINT) AS abs_d8,
       |  CAST(dollar_vol4 AS BIGINT) AS dollar_vol4,
       |  (CAST(abs_d8 AS DOUBLE) / 8.0) * 1000000.0 /
       |    (CAST(dollar_vol4 AS DOUBLE) / 4.0) AS illiq_e6
       |FROM d WHERE abs_d8 IS NOT NULL
       |ORDER BY symbol, day""".stripMargin
  }

  // ------------------------------------------------ beta vs benchmark
  private val betaEnd = "2021-01-06T00:00:00Z"
  private val betaBenchmark = "SPY"

  /** Price-change beta vs a benchmark series: for each symbol,
    * cov(Δclose, Δclose_bench)/var(Δclose_bench) over hourly bars,
    * kept exact as the two BIGINT moment combinations n·Σxy − Σx·Σy
    * and n·Σyy − (Σy)², with ONE final IEEE division.
    *
    * Scale shape: the benchmark series is BOUNDED (one symbol × the
    * window's bar count — thousands of rows at any corpus size), so
    * broadcasting it is genuinely safe and the fact side never
    * shuffles for the join; the moment sums are partial-aggregable.
    * This is the shape factor-model pipelines use: a 100 TB bar store
    * joins a kilobyte factor series. */
  def beta(spark: SparkSession, dir: String): DataFrame = {
    def deltas(symbols: Seq[String]): DataFrame = {
      val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
      spark.read.format("Alpaca_Stocks_Bars")
        .options(baseOptions(symbols: _*) ++ Map(
          "timeframe" -> "1Hour", "start" -> msStart, "end" -> betaEnd))
        .load()
        .select(col("symbol"), col("time"),
          round(col("close") * 8).cast("long").as("close8"))
        .withColumn("d", col("close8") - lag(col("close8"), 1).over(w))
        .filter(col("d").isNotNull)
    }
    val bench = deltas(Seq(betaBenchmark))
      .select(col("time").as("b_time"), col("d").as("dm"))
    deltas(msSymbols)
      .join(broadcast(bench), col("time") === col("b_time"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        sum(col("d") * col("dm")).as("sxy"),
        sum(col("d")).as("sx"), sum(col("dm")).as("sm"),
        sum(col("dm") * col("dm")).as("smm"))
      .withColumn("beta_num", col("n") * col("sxy") - col("sx") * col("sm"))
      .withColumn("beta_den", col("n") * col("smm") - col("sm") * col("sm"))
      .select(col("symbol"), col("n"), col("beta_num"), col("beta_den"),
        (col("beta_num").cast("double") / col("beta_den").cast("double"))
          .as("beta"))
      .orderBy(col("symbol"))
  }

  def betaSql: String = {
    def rows(symbols: Seq[String]) = symbols.sorted.flatMap { s =>
      AlpacaFixtures.bars(s, us(msStart), us(betaEnd), Hour)
    }.map { b =>
      s"(${sqlStr(b.symbol)}, ${b.timeUs}, ${math.round(b.close * 8)})"
    }
    s"""WITH bars(symbol, t_us, close8) AS
       |  (VALUES ${rows(msSymbols :+ betaBenchmark).mkString(",\n  ")}),
       |d AS (
       |  SELECT symbol, t_us,
       |    close8 - LAG(close8) OVER (PARTITION BY symbol ORDER BY t_us) AS d
       |  FROM bars),
       |fact AS (SELECT * FROM d WHERE d IS NOT NULL AND symbol <> '$betaBenchmark'),
       |bench AS (SELECT t_us, d AS dm FROM d
       |  WHERE d IS NOT NULL AND symbol = '$betaBenchmark'),
       |m AS (
       |  SELECT f.symbol, COUNT(*) AS n, SUM(f.d * b.dm) AS sxy,
       |    SUM(f.d) AS sx, SUM(b.dm) AS sm, SUM(b.dm * b.dm) AS smm
       |  FROM fact f JOIN bench b ON f.t_us = b.t_us
       |  GROUP BY f.symbol)
       |SELECT symbol, n,
       |  CAST(n * sxy - sx * sm AS BIGINT) AS beta_num,
       |  CAST(n * smm - sm * sm AS BIGINT) AS beta_den,
       |  CAST(n * sxy - sx * sm AS DOUBLE) / CAST(n * smm - sm * sm AS DOUBLE)
       |    AS beta
       |FROM m ORDER BY symbol""".stripMargin
  }

  // ------------------------------------------------ event study
  private val esStart = "2021-01-01T00:00:00Z"
  private val esEnd = "2021-03-01T00:00:00Z"
  private val EsWin = 3

  /** Corporate-action event study — mean close-to-close move at each
    * relative day in [−3, +3] around ex-dates, split by action type
    * (the dividend-capture / split-drift chart every event study
    * draws). The event window is an EQUI-join: each tiny event row
    * explodes into its 7 (event, offset) rows and joins bars on
    * (symbol, day) — never a range join, and the bars side never
    * shuffles for it (events×7 stays bounded by the action calendar
    * at any corpus size → broadcast). Per-day moves come from one
    * symbol-clustered lag window on the bars; sums stay BIGINT with
    * one final IEEE division per cell. */
  def eventStudy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("day"))
    val bars = spark.read.format("Alpaca_Stocks_Bars")
      .options(baseOptions(msSymbols: _*) ++ Map(
        "timeframe" -> "1Day", "start" -> esStart, "end" -> esEnd))
      .load()
      .select(col("symbol"), to_date(col("time")).as("day"),
        round(col("close") * 8).cast("long").as("close8"))
      .withColumn("d8", col("close8") - lag(col("close8"), 1).over(w))
      .filter(col("d8").isNotNull)
    val eventDays = spark.read.format("Alpaca_Corporate_Actions")
      .options(baseOptions(msSymbols: _*) ++ Map(
        "start" -> esStart, "end" -> esEnd, "types" -> "dividend,split"))
      .load()
      .select(col("symbol").as("e_sym"), col("type"),
        to_date(col("ex_date")).as("ex_day"),
        explode(sequence(lit(-EsWin), lit(EsWin))).as("offset"))
      .select(col("e_sym"), col("type"), col("offset").cast("int").as("offset"),
        date_add(col("ex_day"), col("offset")).as("obs_day"))
    bars.join(broadcast(eventDays),
        col("symbol") === col("e_sym") && col("day") === col("obs_day"))
      .groupBy(col("type"), col("offset"))
      .agg(count(lit(1)).as("n_obs"), sum(col("d8")).as("sum_d8"))
      .select(col("type"), col("offset"), col("n_obs"), col("sum_d8"),
        (col("sum_d8").cast("double") / col("n_obs").cast("double") / lit(8.0))
          .as("mean_move"))
      .orderBy(col("type"), col("offset"))
  }

  def eventStudySql: String = {
    val barRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.bars(s, us(esStart), us(esEnd), Day)
    }.map { b =>
      s"(${sqlStr(b.symbol)}, DATE ${sqlStr(fmtTs(b.timeUs).take(10))}, " +
        s"${math.round(b.close * 8)})"
    }
    val evRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.corpActions(s, us(esStart), us(esEnd))
    }.map { c =>
      s"(${sqlStr(c.symbol)}, ${sqlStr(c.tpe)}, " +
        s"DATE ${sqlStr(fmtTs(c.exDateUs.get).take(10))})"
    }
    s"""WITH bars(symbol, day, close8) AS (VALUES ${barRows.mkString(",\n  ")}),
       |moves AS (
       |  SELECT symbol, day,
       |    close8 - LAG(close8) OVER (PARTITION BY symbol ORDER BY day) AS d8
       |  FROM bars),
       |ev(symbol, type, ex_day) AS (VALUES ${evRows.mkString(",\n  ")}),
       |evx AS (
       |  SELECT e.symbol, e.type, CAST(o.offset AS INTEGER) AS offset,
       |    e.ex_day + CAST(o.offset AS INTEGER) AS obs_day
       |  FROM ev e, (SELECT UNNEST(generate_series(-$EsWin, $EsWin)) AS offset) o)
       |SELECT x.type, x.offset, COUNT(*) AS n_obs,
       |  CAST(SUM(m.d8) AS BIGINT) AS sum_d8,
       |  CAST(SUM(m.d8) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 8.0 AS mean_move
       |FROM moves m JOIN evx x
       |  ON m.symbol = x.symbol AND m.day = x.obs_day
       |WHERE m.d8 IS NOT NULL
       |GROUP BY x.type, x.offset
       |ORDER BY x.type, x.offset""".stripMargin
  }

  // ------------------------------------------------ dividend adjustment
  private val divStart = "2021-01-01T00:00:00Z"
  private val divEnd = "2021-03-01T00:00:00Z"

  /** Dividend total-return adjustment — the cash-distribution twin of
    * `alpaca_split_adjusted`: adjusted close = close − Σ(amounts of
    * dividends with ex_date strictly after the bar). The additive
    * back-adjustment keeps everything EXACT: amounts sit on the 1/4
    * grid, so the per-bar adjustment is a BIGINT sum of amount4 —
    * order-free, unlike a multiplicative factor chain of arbitrary
    * doubles — and the final subtraction is one exact-operand IEEE op.
    *
    * Scale shape: the dividend calendar is bounded (per symbol×quarter
    * rows at any corpus size) → broadcast; bars never shuffle for the
    * join; the per-bar sum is a partial-aggregable BIGINT. */
  def dividendAdjusted(spark: SparkSession, dir: String): DataFrame = {
    val bars = spark.read.format("Alpaca_Stocks_Bars")
      .options(baseOptions(msSymbols: _*) ++ Map(
        "timeframe" -> "1Day", "start" -> divStart, "end" -> divEnd))
      .load()
      .select(col("symbol"), col("time"), col("close"))
    val divs = spark.read.format("Alpaca_Corporate_Actions")
      .options(baseOptions(msSymbols: _*) ++ Map(
        "start" -> divStart, "end" -> divEnd, "types" -> "dividend"))
      .load()
      .filter(col("type") === "dividend")
      .select(col("symbol").as("d_sym"), col("ex_date"),
        round(col("amount") * 4).cast("long").as("amount4"))
    bars.join(broadcast(divs),
        col("symbol") === col("d_sym") && col("ex_date") > col("time"), "left")
      .groupBy(col("symbol"), col("time"), col("close"))
      .agg(coalesce(sum(col("amount4")), lit(0L)).as("div4_after"))
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd").as("day"),
        col("close"), col("div4_after"),
        (col("close") - col("div4_after").cast("double") / lit(4.0))
          .as("adj_close_tr"))
      .orderBy(col("symbol"), col("day"))
  }

  def dividendAdjustedSql: String = {
    val barRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.bars(s, us(divStart), us(divEnd), Day)
    }.map { b =>
      s"(${sqlStr(b.symbol)}, ${sqlStr(fmtTs(b.timeUs).take(10))}, ${fmtD(b.close)})"
    }
    val divRows = msSymbols.sorted.flatMap { s =>
      AlpacaFixtures.corpActions(s, us(divStart), us(divEnd))
    }.filter(_.tpe == "dividend").map { c =>
      s"(${sqlStr(c.symbol)}, ${sqlStr(fmtTs(c.exDateUs.get).take(10))}, " +
        s"${math.round(c.amount * 4)})"
    }
    s"""WITH bars AS (
       |  SELECT * FROM (VALUES ${barRows.mkString(",\n  ")})
       |    AS v(symbol, day, close)),
       |divs AS (
       |  SELECT * FROM (VALUES ${divRows.mkString(",\n  ")})
       |    AS s(symbol, ex_day, amount4))
       |SELECT b.symbol, b.day, CAST(b.close AS DOUBLE) AS close,
       |  CAST(COALESCE((SELECT SUM(d.amount4) FROM divs d
       |    WHERE d.symbol = b.symbol AND d.ex_day > b.day), 0) AS BIGINT)
       |    AS div4_after,
       |  CAST(b.close AS DOUBLE) -
       |    CAST(COALESCE((SELECT SUM(d.amount4) FROM divs d
       |      WHERE d.symbol = b.symbol AND d.ex_day > b.day), 0) AS DOUBLE)
       |    / 4.0 AS adj_close_tr
       |FROM bars b
       |ORDER BY b.symbol, b.day""".stripMargin
  }

  // -------------------------------------------- implementation shortfall
  /** Implementation shortfall vs arrival price (Perold 1988), the
    * other half of TCA next to the markout decomposition: treat each
    * (symbol, hour) as a parent order, take the ARRIVAL mid as the
    * first quote mid of the hour (min_by on the unique quote
    * instants), and charge the hour's trade VWAP against it. All
    * integer internals — pxv8 = Σ price8·size and the arrival mid8
    * are exact BIGINTs; vwap8 and the shortfall are a fixed two-op
    * IEEE tail. Both sides aggregate BEFORE the join, so the join
    * carries |symbol-hours| rows regardless of print volume, and both
    * aggregations are partial (one symbol-clustered exchange each at
    * 100 TB — and zero with the scan-reported partitioning). */
  def implShortfall(spark: SparkSession, dir: String): DataFrame = {
    val fills = lrTrades(spark)
      .withColumn("hr", expr("t_us div 3600000000"))
      .groupBy(col("symbol"), col("hr"))
      .agg(count(lit(1)).as("n_fills"),
        sum(col("size")).as("volume"),
        sum(col("price8") * col("size")).as("pxv8"))
    val arrivals = lrQuotes(spark)
      .withColumn("hr", expr("t_us div 3600000000"))
      .groupBy(col("symbol"), col("hr"))
      .agg(expr("min_by(mid8, t_us)").as("arrival_mid8"))
    fills.join(arrivals, Seq("symbol", "hr"))
      .withColumn("vwap8",
        col("pxv8").cast("double") / col("volume").cast("double"))
      .withColumn("shortfall8", col("vwap8") - col("arrival_mid8").cast("double"))
      .orderBy(col("symbol"), col("hr"))
  }

  /** Exact string→DOUBLE literal (bare 17-digit decimals are typed
    * DECIMAL in DuckDB and rounded — PARITY.md §16). */
  private def fmtDExact(d: Double): String = s"CAST('${d.toString}' AS DOUBLE)"

  def implShortfallSql: String = {
    val rows = msSymbols.sorted.flatMap { s =>
      val ts = AlpacaFixtures.trades(s, us(msStart), us(quotesEnd))
      val qs = AlpacaFixtures.stockQuotes(s, us(msStart), us(quotesEnd))
      val arrivals = qs.groupBy(_.timeUs / Hour).map { case (hr, hq) =>
        val first = hq.minBy(_.timeUs)
        hr -> math.round((first.bidPrice + first.askPrice) * 4)
      }
      ts.groupBy(_.timeUs / Hour).toSeq.sortBy(_._1).flatMap { case (hr, ht) =>
        arrivals.get(hr).map { mid8 =>
          val vol = ht.map(_.size).sum
          val pxv8 = ht.map(t => math.round(t.price * 8) * t.size).sum
          val vwap8 = pxv8.toDouble / vol.toDouble
          val shortfall8 = vwap8 - mid8.toDouble
          s"(${sqlStr(s)}, $hr, ${ht.size}, $vol, $pxv8, $mid8, " +
            s"${fmtDExact(vwap8)}, ${fmtDExact(shortfall8)})"
        }
      }
    }
    s"""SELECT symbol, CAST(hr AS BIGINT) AS hr,
       |  CAST(n_fills AS BIGINT) AS n_fills, CAST(volume AS BIGINT) AS volume,
       |  CAST(pxv8 AS BIGINT) AS pxv8, CAST(arrival_mid8 AS BIGINT) AS arrival_mid8,
       |  CAST(vwap8 AS DOUBLE) AS vwap8, CAST(shortfall8 AS DOUBLE) AS shortfall8
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, hr, n_fills, volume, pxv8, arrival_mid8, vwap8, shortfall8)
       |ORDER BY symbol, hr""".stripMargin
  }

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "alpaca_lee_ready" -> ((leeReady _, leeReadySql)),
    "alpaca_impl_shortfall" -> ((implShortfall _, implShortfallSql)),
    "alpaca_lee_ready_bucketed" -> ((leeReadyBucketed _, leeReadySql)),
    "alpaca_kyle_lambda" -> ((kyleLambda _, kyleLambdaSql)),
    "alpaca_vpin" -> ((vpin _, vpinSql)),
    "alpaca_markout" -> ((markout _, markoutSql)),
    "alpaca_markout_multi" -> ((markoutMulti _, markoutMultiSql)),
    "alpaca_variance_ratio" -> ((varianceRatio _, varianceRatioSql)),
    "alpaca_stream_tick_rule" -> ((streamTickRule _, streamTickRuleSql)),
    "alpaca_crypto_tick_accuracy" ->
      ((cryptoTickAccuracy _, cryptoTickAccuracySql)),
    "alpaca_event_study" -> ((eventStudy _, eventStudySql)),
    "alpaca_roll_spread" -> ((rollSpread _, rollSpreadSql)),
    "alpaca_amihud" -> ((amihud _, amihudSql)),
    "alpaca_beta" -> ((beta _, betaSql)),
    "alpaca_dividend_adjusted" -> ((dividendAdjusted _, dividendAdjustedSql)))
}
