package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.stub.AlpacaFixtures

/** One EWMA point emitted per bar by [[EwmaProcessor]]. */
case class EwmaOut(symbol: String, time_us: Long, n_bars: Int, ewma: Double)

/** `transformWithState` processor holding the K-bar EWMA frame as
  * typed ListState: the STREAMING form of [[AlpacaAnalytics.ewma]].
  * State per symbol = at most K (hour-index, close×4) pairs; each
  * batch's rows are sorted by hour index before folding (rows within
  * a micro-batch arrive unordered; batches themselves tile time in
  * order — the connector's offset contract, gated by
  * `alpaca_stream_bars_scan`). The arithmetic is the batch gate's
  * exact op chain (BIGINT shifts, one IEEE division), so the drained
  * output must hash-equal the SAME oracle. */
class EwmaProcessor(k: Int)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    String, (String, Long, Long), EwmaOut] {
  import org.apache.spark.sql.streaming.{ListState, TimeMode, TimerValues, TTLConfig}
  import org.apache.spark.sql.streaming.OutputMode
  import org.apache.spark.sql.Encoders

  @transient private var frame: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    frame = getHandle.getListState[(Long, Long)]("frame",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[EwmaOut] = {
    val incoming = rows.toVector.sortBy(_._2) // (symbol, j, c4) by hour index
    var fr = frame.get().toVector // ≤ k entries, ascending j
    val out = Vector.newBuilder[EwmaOut]
    incoming.foreach { case (_, j, c4) =>
      // The 2^i weights assume strictly increasing hour indices: a
      // late bar with j < the stored frame tail would be appended
      // POSITIONALLY, silently misweighting every subsequent EWMA
      // point for this symbol. The connector's offset-tiling contract
      // guarantees non-decreasing order; enforce it loudly rather
      // than emitting wrong values if that contract is ever broken.
      // An exact redelivery of the boundary bar (same j, same close —
      // the at-least-once replay a restarted micro-batch produces) is
      // idempotently skipped, not failed: replay is allowed by the
      // contract, regression is not.
      val isReplay = fr.nonEmpty && j == fr.last._1 && c4 == fr.last._2
      require(isReplay || fr.isEmpty || j > fr.last._1,
        s"EwmaProcessor[$key]: out-of-order hour index $j ≤ frame tail " +
          s"${fr.last._1} — a regressing or value-conflicting bar " +
          "violates the source's non-decreasing offset-tiling contract")
      if (!isReplay) {
      fr = (fr :+ (j, c4)).takeRight(k)
      var num = 0L
      var i = 0
      while (i < fr.size) { num += fr(i)._2 << i; i += 1 }
      val den = (1L << fr.size) - 1L
      out += EwmaOut(key, j * AlpacaFixtures.HourUs, fr.size,
        num.toDouble / (den.toDouble * 4.0))
      }
    }
    frame.clear()
    fr.foreach(frame.appendValue)
    out.result().iterator
  }
}

/**
 * Time-series analytics over connector data — the queries a market-data
 * user of the reference actually runs on bars once they are in Spark
 * (the reference's own USAGE.md closes with exactly this kind of SQL
 * over the loaded views; reference: `USAGE.md:245-280`): daily VWAP,
 * moving averages, close-to-close returns. Each gate reads through the
 * full DSv2 connector path against the stub and carries a fixture-
 * computed DuckDB VALUES oracle.
 *
 * Double-exactness: fixture prices sit on a 0.25 grid, so every
 * product/sum here is an exactly-representable multiple of 2^-2 —
 * order-independent with NO rounding — and divisions are single IEEE
 * ops on identical operands in both engines. Returns/averages are
 * therefore bit-exact without tolerances.
 *
 * Scale design: VWAP/returns are partial aggregations / single-pass
 * windows partitioned by symbol — at 100 TB the shuffle carries one
 * row per (symbol, day) or per bar, never page payloads; the window
 * sort is per-symbol and the connector has already planned
 * symbol × interval partitions, so symbol-partitioned windows read
 * almost-sorted runs.
 */
object AlpacaAnalytics {
  import AlpacaQueries.{baseOptions, fmtD, fmtTs, sqlStr, us}

  private val Hour = AlpacaFixtures.HourUs
  private val Day = AlpacaFixtures.DayUs

  private val symbols = Seq("AAPL", "MSFT")

  /** Full-precision double literal for DuckDB: a bare 17-significant-
    * digit decimal literal is typed DECIMAL and ROUNDED before any
    * cast, so returns (arbitrary quotients, unlike the 0.25-grid
    * prices) must go through an exact strtod string→DOUBLE parse. */
  private def fmtDExact(d: Double): String = s"CAST('${d.toString}' AS DOUBLE)"

  /** Analytics loads opt into the scan-reported symbol partitioning
    * (`cluster_by_symbol`): every query below windows/aggregates BY
    * SYMBOL, so the reported KeyGroupedPartitioning deletes the
    * per-symbol Exchange (and, where the scan order suffices, the
    * Sort) that each of these gates used to pay — at 100 TB that is
    * the scan output never shuffling at all. The v2-bucketing flag is
    * the session switch Spark gates partition grouping behind; it has
    * no effect on scans that don't report a partitioning. */
  private def barsDf(spark: SparkSession, timeframe: String,
      start: String, end: String): DataFrame = {
    graft.core.SessionTuning.enableSpj(spark)
    spark.read.format("Alpaca_Stocks_Bars")
      .options(baseOptions(symbols: _*) ++ Map(
        "timeframe" -> timeframe, "start" -> start, "end" -> end,
        "cluster_by_symbol" -> "true"))
      .load()
  }

  // ------------------------------------------------------- daily VWAP
  private val vwapStart = "2021-01-04T00:00:00Z"
  private val vwapEnd = "2021-01-11T00:00:00Z"

  /** Volume-weighted average price per (symbol, day) from hourly bars:
    * sum(vwap·volume)/sum(volume) — one partial-aggregable shuffle of
    * (symbol, day) groups. */
  def vwapDaily(spark: SparkSession, dir: String): DataFrame =
    barsDf(spark, "1Hour", vwapStart, vwapEnd)
      .groupBy(col("symbol"), date_format(col("time"), "yyyy-MM-dd").as("day"))
      .agg((sum(col("vwap") * col("volume")) / sum(col("volume"))).as("daily_vwap"),
        sum(col("volume")).as("total_volume"),
        count(lit(1)).as("n_bars"))
      .orderBy(col("symbol"), col("day"))

  def vwapDailySql: String = {
    val rows = symbols.sorted.flatMap { s =>
      AlpacaFixtures.bars(s, us(vwapStart), us(vwapEnd), Hour)
        .groupBy(b => fmtTs(b.timeUs).take(10)).toSeq.sortBy(_._1)
        .map { case (day, bs) =>
          val vSum = bs.map(_.volume).sum
          val pvSum = bs.map(b => b.vwap * b.volume).sum // exact: 0.25-grid × int
          s"(${sqlStr(s)}, ${sqlStr(day)}, ${fmtD(pvSum / vSum)}, $vSum, ${bs.size})"
        }
    }
    s"""SELECT symbol, day, CAST(daily_vwap AS DOUBLE) AS daily_vwap,
       |  CAST(total_volume AS BIGINT) AS total_volume, CAST(n_bars AS BIGINT) AS n_bars
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, day, daily_vwap, total_volume, n_bars)
       |ORDER BY symbol, day""".stripMargin
  }

  // --------------------------------------------------- 8-bar SMA flag
  private val smaStart = "2021-01-04T00:00:00Z"
  private val smaEnd = "2021-01-06T00:00:00Z"
  private val SmaN = 8

  /** Trailing 8-bar simple moving average of close + above/below flag:
    * the classic crossover input. One window pass per symbol. */
  def smaCrossover(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
      .rowsBetween(-(SmaN - 1), 0)
    barsDf(spark, "1Hour", smaStart, smaEnd)
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("bar_time"),
        col("close"), avg(col("close")).over(w).as("sma"))
      .withColumn("above_sma", when(col("close") > col("sma"), 1L).otherwise(0L))
      .orderBy(col("symbol"), col("bar_time"))
  }

  def smaCrossoverSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val bs = AlpacaFixtures.bars(s, us(smaStart), us(smaEnd), Hour)
      bs.zipWithIndex.map { case (b, i) =>
        val win = bs.slice(math.max(0, i - (SmaN - 1)), i + 1)
        val sma = win.map(_.close).sum / win.size // exact sum, one IEEE divide
        s"(${sqlStr(s)}, ${sqlStr(fmtTs(b.timeUs))}, ${fmtD(b.close)}, " +
          s"${fmtD(sma)}, ${if (b.close > sma) 1 else 0})"
      }
    }
    s"""SELECT symbol, bar_time, CAST(close AS DOUBLE) AS close,
       |  CAST(sma AS DOUBLE) AS sma, CAST(above_sma AS BIGINT) AS above_sma
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, bar_time, close, sma, above_sma)
       |ORDER BY symbol, bar_time""".stripMargin
  }

  // ------------------------------------------------ daily returns
  private val retStart = "2021-01-04T00:00:00Z"
  private val retEnd = "2021-02-03T00:00:00Z"

  private def dailyCloses(s: String): Seq[(String, Double)] =
    AlpacaFixtures.bars(s, us(retStart), us(retEnd), Day)
      .map(b => (fmtTs(b.timeUs).take(10), b.close))

  /** Close-to-close daily returns via lag(): first day NULL. */
  def dailyReturns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    barsDf(spark, "1Day", retStart, retEnd)
      .select(col("symbol"), date_format(col("time"), "yyyy-MM-dd").as("day"),
        col("close"),
        ((col("close") - lag(col("close"), 1).over(w)) /
          lag(col("close"), 1).over(w)).as("ret"))
      .orderBy(col("symbol"), col("day"))
  }

  def dailyReturnsSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val closes = dailyCloses(s)
      closes.zipWithIndex.map { case ((day, c), i) =>
        val ret = if (i == 0) "CAST(NULL AS DOUBLE)"
        else fmtDExact((c - closes(i - 1)._2) / closes(i - 1)._2)
        s"(${sqlStr(s)}, ${sqlStr(day)}, ${fmtD(c)}, $ret)"
      }
    }
    s"""SELECT symbol, day, CAST(close AS DOUBLE) AS close, CAST(ret AS DOUBLE) AS ret
       |FROM (VALUES ${rows.mkString(",\n  ")}) AS v(symbol, day, close, ret)
       |ORDER BY symbol, day""".stripMargin
  }

  /** Per-symbol return summary. Only order-independent aggregates
    * (counts, min, max) — a SUM of returns would be IEEE
    * order-dependent across partitions and can never hash-match a
    * serial oracle. */
  def returnSummary(spark: SparkSession, dir: String): DataFrame =
    dailyReturns(spark, dir)
      .filter(col("ret").isNotNull)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("ret") > 0, 1L).otherwise(0L)).as("up_days"),
        max(col("ret")).as("max_ret"),
        min(col("ret")).as("min_ret"))
      .orderBy(col("symbol"))

  def returnSummarySql: String = {
    val rows = symbols.sorted.map { s =>
      val closes = dailyCloses(s)
      val rets = closes.sliding(2).collect {
        case Seq((_, p), (_, c)) => (c - p) / p
      }.toSeq
      s"(${sqlStr(s)}, ${rets.size}, ${rets.count(_ > 0)}, " +
        s"${fmtDExact(rets.max)}, ${fmtDExact(rets.min)})"
    }
    s"""SELECT symbol, CAST(n_days AS BIGINT) AS n_days,
       |  CAST(up_days AS BIGINT) AS up_days, CAST(max_ret AS DOUBLE) AS max_ret,
       |  CAST(min_ret AS DOUBLE) AS min_ret
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, n_days, up_days, max_ret, min_ret)
       |ORDER BY symbol""".stripMargin
  }

  // ------------------------------------------- split-adjusted bars
  /** Split-adjusted daily closes — the canonical two-source market-data
    * computation: every split whose ex-date FOLLOWS a bar scales that
    * bar's close down by its ratio (back-adjustment, so the series is
    * continuous through splits). Both sides read through the
    * connector; the (tiny) split calendar is broadcast; the
    * adjustment factor is a fold over the bar's sort_array'd ratio
    * list — deterministic order, so the doubles are reproducible on
    * any partitioning (a plain product aggregate would not exist, and
    * exp(sum(ln)) would not be bit-exact).
    *
    * Scale: broadcast join (splits per symbol ≪ bars), partial-agg
    * collect_list over ≤ |splits per symbol| elements, zero extra
    * shuffles beyond the bar groupBy. */
  def adjustedBars(spark: SparkSession, dir: String): DataFrame = {
    val bars = barsDf(spark, "1Day", retStart, retEnd)
      .select(col("symbol"), col("time"), col("close"))
    val splits = spark.read.format("Alpaca_Corporate_Actions")
      .options(baseOptions(symbols: _*) ++ Map(
        "start" -> retStart, "end" -> retEnd, "types" -> "split"))
      .load()
      .filter(col("type") === "split")
      .select(col("symbol").as("s_sym"), col("ex_date"), col("ratio"))
    bars.join(broadcast(splits),
        col("symbol") === col("s_sym") && col("ex_date") > col("time"), "left")
      .groupBy(col("symbol"), col("time"), col("close"))
      .agg(sort_array(collect_list(col("ratio"))).as("rs"))
      .select(col("symbol"), date_format(col("time"), "yyyy-MM-dd").as("day"),
        col("close"),
        expr("aggregate(rs, CAST(1.0 AS DOUBLE), (acc, x) -> acc * x)").as("adj_factor"))
      .withColumn("adj_close", col("close") / col("adj_factor"))
      .orderBy(col("symbol"), col("day"))
  }

  def adjustedBarsSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val splits = AlpacaFixtures.corpActions(s, us(retStart), us(retEnd))
        .filter(_.tpe == "split")
      AlpacaFixtures.bars(s, us(retStart), us(retEnd), Day).map { b =>
        val rs = splits.filter(_.exDateUs.exists(_ > b.timeUs)).map(_.ratio).sorted
        val factor = rs.foldLeft(1.0)(_ * _)
        s"(${sqlStr(s)}, ${sqlStr(fmtTs(b.timeUs).take(10))}, ${fmtD(b.close)}, " +
          s"${fmtD(factor)}, ${fmtDExact(b.close / factor)})"
      }
    }
    s"""SELECT symbol, day, CAST(close AS DOUBLE) AS close,
       |  CAST(adj_factor AS DOUBLE) AS adj_factor, CAST(adj_close AS DOUBLE) AS adj_close
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, day, close, adj_factor, adj_close)
       |ORDER BY symbol, day""".stripMargin
  }

  // ------------------------------------------- daily realized variance
  private val volStart = "2021-02-01T00:00:00Z"
  private val volEnd = "2021-02-08T00:00:00Z"

  /** Per-(symbol, day) realized variance of hour-over-hour close moves
    * — the intraday volatility summary a market-data user computes
    * from bars. All internals are EXACT integers: closes sit on the
    * 0.25 grid so `close*100` casts to cents losslessly, moves are
    * cent differences, and the sample variance is assembled from
    * (n, Σd, Σd²) with ONE final IEEE division of two exact longs —
    * bit-identical in both engines with no rounding tolerance (the
    * same rational-form discipline as the LM-scoring gates; ln()/
    * stddev() accumulation order would not be cross-engine-stable).
    *
    * Scale design: one window pass partitioned by (symbol, day) for
    * the lag, then a partial aggregation on the same key — at 100 TB
    * the shuffle carries one row per bar (already symbol×interval
    * partitioned by the connector) and the variance composes from
    * per-partition (n, Σd, Σd²) partials. */
  def volatilityDaily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol"), col("day")).orderBy(col("time"))
    barsDf(spark, "1Hour", volStart, volEnd)
      .withColumn("day", date_format(col("time"), "yyyy-MM-dd"))
      .withColumn("cents", (col("close") * 100).cast("bigint"))
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .filter(col("prev_cents").isNotNull)
      .withColumn("d", col("cents") - col("prev_cents"))
      .groupBy(col("symbol"), col("day"))
      .agg(count(lit(1)).as("n_moves"),
        sum(col("d")).as("sum_d"),
        sum(col("d") * col("d")).as("sum_d2"))
      // sample variance needs >= 2 moves: a single-move day has a zero
      // denominator (n*(n-1)); the oracle applies the identical n >= 2
      // cut so sparse days agree instead of depending on dense fixtures
      .filter(col("n_moves") > 1)
      .withColumn("realized_var",
        (col("n_moves") * col("sum_d2") - col("sum_d") * col("sum_d"))
          .cast("double") /
          (col("n_moves") * (col("n_moves") - 1)).cast("double"))
      .orderBy(col("symbol"), col("day"))
  }

  def volatilityDailySql: String = {
    val rows = symbols.sorted.flatMap { s =>
      AlpacaFixtures.bars(s, us(volStart), us(volEnd), Hour)
        .groupBy(b => fmtTs(b.timeUs).take(10)).toSeq.sortBy(_._1)
        .flatMap { case (day, bs) =>
          val cents = bs.sortBy(_.timeUs).map(b => (b.close * 100).toLong)
          val ds = cents.zip(cents.tail).map { case (a, b) => b - a }
          val n = ds.size.toLong
          // same n >= 2 cut as the Spark side: a 0- or 1-move day has
          // no sample variance (0/0) — emit nothing, don't emit NaN
          if (n < 2) None
          else {
            val sumD = ds.sum
            val sumD2 = ds.map(d => d * d).sum
            val v = (n * sumD2 - sumD * sumD).toDouble / (n * (n - 1)).toDouble
            Some(s"(${sqlStr(s)}, ${sqlStr(day)}, $n, $sumD, $sumD2, ${fmtDExact(v)})")
          }
        }
    }
    s"""SELECT symbol, day, CAST(n_moves AS BIGINT) AS n_moves,
       |  CAST(sum_d AS BIGINT) AS sum_d, CAST(sum_d2 AS BIGINT) AS sum_d2,
       |  CAST(realized_var AS DOUBLE) AS realized_var
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, day, n_moves, sum_d, sum_d2, realized_var)
       |ORDER BY symbol, day""".stripMargin
  }

  // ------------------------------------------------- max drawdown
  /** Running-peak drawdown per symbol (the UNBOUNDED-PRECEDING frame
    * no other gate uses): peak = running max of close over the whole
    * period, drawdown = peak − close, summarized per (symbol, day)
    * as the max drawdown and day-end peak — all exact cent BIGINTs.
    * One window pass per symbol then a partial aggregation; at scale
    * the running max is the canonical prefix-scan window (linear,
    * one frame value of state). */
  def drawdown(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    barsDf(spark, "1Hour", volStart, volEnd)
      .withColumn("cents", (col("close") * 100).cast("bigint"))
      .withColumn("peak", max(col("cents")).over(w))
      .withColumn("dd", col("peak") - col("cents"))
      .withColumn("day", date_format(col("time"), "yyyy-MM-dd"))
      .groupBy(col("symbol"), col("day"))
      .agg(max(col("dd")).as("max_drawdown_cents"),
        max(col("peak")).as("peak_cents"))
      .orderBy(col("symbol"), col("day"))
  }

  def drawdownSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      var peak = Long.MinValue
      AlpacaFixtures.bars(s, us(volStart), us(volEnd), Hour)
        .sortBy(_.timeUs)
        .map { b =>
          val cents = (b.close * 100).toLong
          peak = math.max(peak, cents)
          (fmtTs(b.timeUs).take(10), peak - cents, peak)
        }
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (day, xs) =>
          s"(${sqlStr(s)}, ${sqlStr(day)}, ${xs.map(_._2).max}, ${xs.map(_._3).max})"
        }
    }
    s"""SELECT symbol, day, CAST(max_drawdown_cents AS BIGINT) AS max_drawdown_cents,
       |  CAST(peak_cents AS BIGINT) AS peak_cents
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, day, max_drawdown_cents, peak_cents)
       |ORDER BY symbol, day""".stripMargin
  }

  // --------------------------------------------------- RSI (Cutler)
  private val rsiStart = "2021-03-01T00:00:00Z"
  private val rsiEnd = "2021-03-04T00:00:00Z"
  private val RsiN = 14

  /** Cutler's RSI-14 over hourly bars (the SMA-based variant — the
    * Wilder recursive-EMA form has an infinite memory horizon, which
    * no bounded window frame can express and no cross-engine oracle
    * can replay exactly). All internals are exact integers: cent
    * moves, gain/loss sums over a 14-diff frame, and the rational
    * single-division form rsi = 100·Σgain / (Σgain + Σloss) — which
    * equals 100 − 100/(1+RS) algebraically but costs ONE IEEE divide
    * of two exact longs, so it is bit-identical to the serial oracle
    * on any partitioning (and a flat-but-nonconstant window needs no
    * special case: Σloss = 0 ⇒ exactly 100.0).
    *
    * Scale: one symbol exchange feeds a single Window node holding
    * the lag, the row_number and both framed sums (same partition +
    * order spec); rows-frame state is 14 longs. Emitted only for full
    * lookbacks (rn ≥ 14 diffs), the standard convention. */
  def rsi(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    val w14 = w.rowsBetween(-(RsiN - 1), 0)
    barsDf(spark, "1Hour", rsiStart, rsiEnd)
      .withColumn("cents", (col("close") * 100).cast("bigint"))
      .withColumn("d", col("cents") - lag(col("cents"), 1).over(w))
      .filter(col("d").isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("sum_gain", sum(when(col("d") > 0, col("d")).otherwise(0L)).over(w14))
      .withColumn("sum_loss", sum(when(col("d") < 0, -col("d")).otherwise(0L)).over(w14))
      .filter(col("rn") >= RsiN)
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("bar_time"),
        col("close"), col("sum_gain"), col("sum_loss"),
        when(col("sum_gain") + col("sum_loss") === 0L, lit(null).cast("double"))
          .otherwise((col("sum_gain") * 100L).cast("double") /
            (col("sum_gain") + col("sum_loss")).cast("double")).as("rsi"))
      .orderBy(col("symbol"), col("bar_time"))
  }

  def rsiSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val bs = AlpacaFixtures.bars(s, us(rsiStart), us(rsiEnd), Hour)
      val cents = bs.map(b => (b.close * 100).toLong)
      val diffs = cents.zip(cents.tail).map { case (a, b) => b - a }
      (RsiN - 1 until diffs.size).map { j =>
        val win = diffs.slice(j - (RsiN - 1), j + 1)
        val sg = win.filter(_ > 0).sum
        val sl = -win.filter(_ < 0).sum
        val b = bs(j + 1) // diff j closes at bar j+1
        val rsiLit = if (sg + sl == 0L) "CAST(NULL AS DOUBLE)"
        else fmtDExact((sg * 100L).toDouble / (sg + sl).toDouble)
        s"(${sqlStr(s)}, ${sqlStr(fmtTs(b.timeUs))}, ${fmtD(b.close)}, $sg, $sl, $rsiLit)"
      }
    }
    s"""SELECT symbol, bar_time, CAST(close AS DOUBLE) AS close,
       |  CAST(sum_gain AS BIGINT) AS sum_gain, CAST(sum_loss AS BIGINT) AS sum_loss,
       |  CAST(rsi AS DOUBLE) AS rsi
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, bar_time, close, sum_gain, sum_loss, rsi)
       |ORDER BY symbol, bar_time""".stripMargin
  }

  // ---------------------------------------------- Bollinger bands
  private val bollStart = "2021-03-08T00:00:00Z"
  private val bollEnd = "2021-03-11T00:00:00Z"
  private val BollN = 20

  /** 20-bar Bollinger bands (±2σ, population σ) + %B, in cents. The
    * moving mean and variance are assembled from exact-integer frame
    * sums (Σc, Σc² — closes are cent longs, so both are exact and
    * order-independent), then a FIXED chain of IEEE ops replayed
    * identically by the serial oracle: mean = Σc/n,
    * var = (n·Σc² − (Σc)²)/n², sd = √var, bands = mean ± 2·sd,
    * %B = (c − lower)/(upper − lower). stddev()/avg() would hand the
    * accumulation order to each engine's aggregate internals — the
    * exact-sum + explicit-expression form keeps it deterministic
    * (same discipline as alpaca_volatility). %B NULL-guards the
    * flat-window case (sd = 0 ⇒ bands collapse).
    *
    * Scale: one symbol exchange, one Window node (row_number + both
    * framed sums share the spec), frame state = 20 longs. Full
    * windows only (rn ≥ 20). */
  def bollinger(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    val wN = w.rowsBetween(-(BollN - 1), 0)
    val n = BollN.toLong
    barsDf(spark, "1Hour", bollStart, bollEnd)
      .withColumn("cents", (col("close") * 100).cast("bigint"))
      .withColumn("rn", row_number().over(w))
      .withColumn("sum_c", sum(col("cents")).over(wN))
      .withColumn("sum_c2", sum(col("cents") * col("cents")).over(wN))
      .filter(col("rn") >= BollN)
      .withColumn("mean_c", col("sum_c").cast("double") / lit(n.toDouble))
      .withColumn("var_c",
        (lit(n) * col("sum_c2") - col("sum_c") * col("sum_c")).cast("double") /
          lit((n * n).toDouble))
      .withColumn("sd_c", sqrt(col("var_c")))
      .withColumn("upper_c", col("mean_c") + lit(2.0) * col("sd_c"))
      .withColumn("lower_c", col("mean_c") - lit(2.0) * col("sd_c"))
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("bar_time"),
        col("cents"), col("mean_c"), col("sd_c"), col("upper_c"), col("lower_c"),
        when(col("sd_c") === 0.0, lit(null).cast("double"))
          .otherwise((col("cents").cast("double") - col("lower_c")) /
            (col("upper_c") - col("lower_c"))).as("pct_b"))
      .orderBy(col("symbol"), col("bar_time"))
  }

  def bollingerSql: String = {
    val n = BollN.toLong
    val rows = symbols.sorted.flatMap { s =>
      val bs = AlpacaFixtures.bars(s, us(bollStart), us(bollEnd), Hour)
      val cents = bs.map(b => (b.close * 100).toLong)
      (BollN - 1 until bs.size).map { j =>
        val win = cents.slice(j - (BollN - 1), j + 1)
        val sumC = win.sum
        val sumC2 = win.map(c => c * c).sum
        // the EXACT op chain of the Spark expressions above
        val mean = sumC.toDouble / n.toDouble
        val varC = (n * sumC2 - sumC * sumC).toDouble / (n * n).toDouble
        val sd = math.sqrt(varC)
        val upper = mean + 2.0 * sd
        val lower = mean - 2.0 * sd
        val pctB = if (sd == 0.0) "CAST(NULL AS DOUBLE)"
        else fmtDExact((cents(j).toDouble - lower) / (upper - lower))
        s"(${sqlStr(s)}, ${sqlStr(fmtTs(bs(j).timeUs))}, ${cents(j)}, " +
          s"${fmtDExact(mean)}, ${fmtDExact(sd)}, ${fmtDExact(upper)}, " +
          s"${fmtDExact(lower)}, $pctB)"
      }
    }
    s"""SELECT symbol, bar_time, CAST(cents AS BIGINT) AS cents,
       |  CAST(mean_c AS DOUBLE) AS mean_c, CAST(sd_c AS DOUBLE) AS sd_c,
       |  CAST(upper_c AS DOUBLE) AS upper_c, CAST(lower_c AS DOUBLE) AS lower_c,
       |  CAST(pct_b AS DOUBLE) AS pct_b
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, bar_time, cents, mean_c, sd_c, upper_c, lower_c, pct_b)
       |ORDER BY symbol, bar_time""".stripMargin
  }

  // ------------------------------------------------ EWMA (α = 1/2)
  private val EwmaK = 16
  private val ewmaStart = "2021-01-04T00:00:00Z"
  private val ewmaEnd = "2021-01-07T00:00:00Z"

  /** Exponentially weighted moving average of close — the standard EMA
    * indicator, in an EXACT windowed form. The usual recursive
    * definition (ema := α·x + (1−α)·ema₋₁) is a serial scan with
    * unbounded float drift; with α = 1/2 over a K-bar trailing frame
    * the weights are powers of two, so the numerator Σ close₄·2^i
    * (close×4 is an exact integer on the fixture's 0.25 grid) and the
    * denominator 2^s−1 are exact BIGINTs, and the only IEEE op is ONE
    * final division — bit-equal on any engine, any layout.
    *
    * Frame order is not trusted from collect_list: each frame element
    * carries its hour index j, the packed array is array_sort'ed (j is
    * a total order), and the positional weight 2^i comes from the
    * sorted transform index — the same order-pinning discipline as the
    * listagg/markout gates. Truncated early frames (s < K) use den
    * 2^s−1, so every bar emits. Plan: one symbol exchange (deleted by
    * the scan's reported partitioning), one window pass, per-row
    * codegen'd HOFs. */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    val wK = w.rowsBetween(-(EwmaK - 1), 0)
    barsDf(spark, "1Hour", ewmaStart, ewmaEnd)
      .withColumn("j", expr(s"unix_micros(time) div $Hour"))
      .withColumn("c4", (col("close") * 4).cast("bigint"))
      .withColumn("fr",
        array_sort(collect_list(struct(col("j"), col("c4"))).over(wK)))
      .withColumn("num", expr(
        "aggregate(transform(fr, (e, i) -> shiftleft(e.c4, i)), 0L, (a, x) -> a + x)"))
      .withColumn("den", expr("shiftleft(1L, size(fr)) - 1L"))
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("bar_time"),
        size(col("fr")).as("n_bars"),
        (col("num").cast("double") / (col("den").cast("double") * lit(4.0)))
          .as("ewma"))
      .orderBy(col("symbol"), col("bar_time"))
  }

  def ewmaSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val bs = AlpacaFixtures.bars(s, us(ewmaStart), us(ewmaEnd), Hour)
      val c4 = bs.map(b => (b.close * 4).toLong)
      bs.indices.map { j =>
        // the EXACT op chain of the Spark expressions above
        val win = c4.slice(math.max(0, j - (EwmaK - 1)), j + 1)
        val num = win.zipWithIndex.map { case (c, i) => c << i }.sum
        val den = (1L << win.size) - 1L
        val e = num.toDouble / (den.toDouble * 4.0)
        s"(${sqlStr(s)}, ${sqlStr(fmtTs(bs(j).timeUs))}, ${win.size}, " +
          s"${fmtDExact(e)})"
      }
    }
    s"""SELECT symbol, bar_time, CAST(n_bars AS INT) AS n_bars,
       |  CAST(ewma AS DOUBLE) AS ewma
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, bar_time, n_bars, ewma)
       |ORDER BY symbol, bar_time""".stripMargin
  }

  /** The EWMA as a STREAM: connector micro-batches (6-hour offset
    * tiles) → `transformWithState` with the K-bar frame in ListState →
    * drained and formatted. Shares [[ewmaSql]] verbatim — the
    * streaming path must produce bit-identical points to the batch
    * window, proving cross-batch frame continuation under the Spark 4
    * arbitrary-state API on real connector data (the tws gate proves
    * the API on synthetic events; this one closes the loop to the
    * source). RocksDB provider is the API's contract, set and
    * restored around the drain.
    *
    * Scale: state = K (long, long) pairs per symbol in RocksDB;
    * emission is per-bar append — no watermark needed because the
    * fold is driven by arrival order, which the connector's offset
    * tiling already serializes per symbol. */
  def streamEwma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.format("Alpaca_Stocks_Bars")
        .options(baseOptions(symbols: _*) ++ Map(
          "timeframe" -> "1Hour", "start" -> ewmaStart, "end" -> ewmaEnd,
          "stream_step" -> "6Hours"))
        .load()
        .select(col("symbol"), expr(s"unix_micros(time) div $Hour").as("j"),
          (col("close") * 4).cast("bigint").as("c4"))
        .as[(String, Long, Long)]
      val out = stream.groupByKey(_._1)
        .transformWithState(new EwmaProcessor(EwmaK),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      Streaming.drainToTable(spark, out.toDF(), "append")
        .select(col("symbol"),
          date_format(timestamp_micros(col("time_us")), "yyyy-MM-dd HH:mm:ss")
            .as("bar_time"),
          col("n_bars"), col("ewma"))
        .orderBy(col("symbol"), col("bar_time"))
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  // --------------------------------------------- ATR (true range)
  /** Average True Range (14-bar SMA form): TR = max(H−L, |H−C₋₁|,
    * |L−C₋₁|) — entirely exact cent longs (greatest/abs of integer
    * differences), with the single IEEE division ΣTR/14 at the end.
    * One symbol exchange; lag + row_number + the framed sum share one
    * Window spec. Full lookbacks only. */
  def atr(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    val w14 = w.rowsBetween(-(RsiN - 1), 0)
    barsDf(spark, "1Hour", rsiStart, rsiEnd)
      .withColumn("h", (col("high") * 100).cast("bigint"))
      .withColumn("l", (col("low") * 100).cast("bigint"))
      .withColumn("c", (col("close") * 100).cast("bigint"))
      .withColumn("pc", lag(col("c"), 1).over(w))
      .filter(col("pc").isNotNull)
      .withColumn("tr", greatest(col("h") - col("l"),
        abs(col("h") - col("pc")), abs(col("l") - col("pc"))))
      .withColumn("rn", row_number().over(w))
      .withColumn("sum_tr", sum(col("tr")).over(w14))
      .filter(col("rn") >= RsiN)
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("bar_time"),
        col("tr").as("tr_cents"), col("sum_tr"),
        (col("sum_tr").cast("double") / lit(RsiN.toDouble)).as("atr_cents"))
      .orderBy(col("symbol"), col("bar_time"))
  }

  def atrSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val bs = AlpacaFixtures.bars(s, us(rsiStart), us(rsiEnd), Hour)
      val trs = bs.zip(bs.tail).map { case (p, b) =>
        val (h, l, pc) = ((b.high * 100).toLong, (b.low * 100).toLong,
          (p.close * 100).toLong)
        math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
      }
      (RsiN - 1 until trs.size).map { j =>
        val sumTr = trs.slice(j - (RsiN - 1), j + 1).sum
        s"(${sqlStr(s)}, ${sqlStr(fmtTs(bs(j + 1).timeUs))}, ${trs(j)}, $sumTr, " +
          s"${fmtDExact(sumTr.toDouble / RsiN.toDouble)})"
      }
    }
    s"""SELECT symbol, bar_time, CAST(tr_cents AS BIGINT) AS tr_cents,
       |  CAST(sum_tr AS BIGINT) AS sum_tr, CAST(atr_cents AS DOUBLE) AS atr_cents
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, bar_time, tr_cents, sum_tr, atr_cents)
       |ORDER BY symbol, bar_time""".stripMargin
  }

  // ----------------------------------------- OBV (on-balance volume)
  /** On-balance volume: cumulative signed volume, ALL exact BIGINTs —
    * the one indicator with no floating point anywhere. The prefix
    * sum is the canonical unbounded-preceding linear-state window
    * (same scan shape as alpaca_drawdown's running peak). */
  def obv(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    barsDf(spark, "1Hour", rsiStart, rsiEnd)
      .withColumn("c", (col("close") * 100).cast("bigint"))
      .withColumn("pc", lag(col("c"), 1).over(w))
      .filter(col("pc").isNotNull)
      .withColumn("signed_vol",
        when(col("c") > col("pc"), col("volume"))
          .when(col("c") < col("pc"), -col("volume")).otherwise(0L))
      .withColumn("obv", sum(col("signed_vol"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("bar_time"),
        col("c").as("close_cents"), col("signed_vol"), col("obv"))
      .orderBy(col("symbol"), col("bar_time"))
  }

  def obvSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val bs = AlpacaFixtures.bars(s, us(rsiStart), us(rsiEnd), Hour)
      var acc = 0L
      bs.zip(bs.tail).map { case (p, b) =>
        val (c, pc) = ((b.close * 100).toLong, (p.close * 100).toLong)
        val sv = if (c > pc) b.volume else if (c < pc) -b.volume else 0L
        acc += sv
        s"(${sqlStr(s)}, ${sqlStr(fmtTs(b.timeUs))}, $c, $sv, $acc)"
      }
    }
    s"""SELECT symbol, bar_time, CAST(close_cents AS BIGINT) AS close_cents,
       |  CAST(signed_vol AS BIGINT) AS signed_vol, CAST(obv AS BIGINT) AS obv
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, bar_time, close_cents, signed_vol, obv)
       |ORDER BY symbol, bar_time""".stripMargin
  }

  // ------------------------------------------- MFI (money flow)
  /** Money Flow Index — the volume-weighted RSI. Everything stays an
    * exact integer by working on 3·TP: tp3 = (H+L+C) in cents (the
    * conventional TP = tp3/3 would round; the ÷3 cancels in every
    * comparison and ratio, so it is never performed). Raw money flow
    * = tp3 · volume (exact long), split pos/neg by the tp3 diff sign,
    * summed over the 14-bar frame, and the index is the rational
    * single-division form 100·Σpos/(Σpos+Σneg) — flat bars contribute
    * to neither side (the standard convention), and an all-flat
    * window NULLs identically in both engines. */
  def mfi(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    val w14 = w.rowsBetween(-(RsiN - 1), 0)
    barsDf(spark, "1Hour", rsiStart, rsiEnd)
      .withColumn("tp3",
        ((col("high") + col("low") + col("close")) * 100).cast("bigint"))
      .withColumn("mf", col("tp3") * col("volume"))
      .withColumn("d", col("tp3") - lag(col("tp3"), 1).over(w))
      .filter(col("d").isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("pos_mf", sum(when(col("d") > 0, col("mf")).otherwise(0L)).over(w14))
      .withColumn("neg_mf", sum(when(col("d") < 0, col("mf")).otherwise(0L)).over(w14))
      .filter(col("rn") >= RsiN)
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("bar_time"),
        col("pos_mf"), col("neg_mf"),
        when(col("pos_mf") + col("neg_mf") === 0L, lit(null).cast("double"))
          .otherwise((col("pos_mf") * 100L).cast("double") /
            (col("pos_mf") + col("neg_mf")).cast("double")).as("mfi"))
      .orderBy(col("symbol"), col("bar_time"))
  }

  def mfiSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val bs = AlpacaFixtures.bars(s, us(rsiStart), us(rsiEnd), Hour)
      val tp3s = bs.map(b => ((b.high + b.low + b.close) * 100).toLong)
      val mfs = bs.zip(tp3s).map { case (b, t) => t * b.volume }
      // per-diff signed money flow: diff j compares bar j+1 vs j and
      // carries bar j+1's raw flow
      val signed = (1 until bs.size).map { i =>
        val d = tp3s(i) - tp3s(i - 1)
        (if (d > 0) mfs(i) else 0L, if (d < 0) mfs(i) else 0L)
      }
      (RsiN - 1 until signed.size).map { j =>
        val win = signed.slice(j - (RsiN - 1), j + 1)
        val pos = win.map(_._1).sum
        val neg = win.map(_._2).sum
        val mfiLit = if (pos + neg == 0L) "CAST(NULL AS DOUBLE)"
        else fmtDExact((pos * 100L).toDouble / (pos + neg).toDouble)
        s"(${sqlStr(s)}, ${sqlStr(fmtTs(bs(j + 1).timeUs))}, $pos, $neg, $mfiLit)"
      }
    }
    s"""SELECT symbol, bar_time, CAST(pos_mf AS BIGINT) AS pos_mf,
       |  CAST(neg_mf AS BIGINT) AS neg_mf, CAST(mfi AS DOUBLE) AS mfi
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, bar_time, pos_mf, neg_mf, mfi)
       |ORDER BY symbol, bar_time""".stripMargin
  }

  // ------------------------------------------ stochastic oscillator
  private val StochN = 14

  /** Stochastic oscillator: %K = 100·(C − L14)/(H14 − L14) over the
    * trailing 14-bar high/low channel, %D = 3-bar SMA of %K. Channel
    * bounds are exact cent mins/maxes; %K is one IEEE division of
    * exact longs (the 100· factor stays integral in the numerator);
    * %D is the explicit fixed chain (k + k₋₁ + k₋₂)/3 via lag — an
    * avg() would hand the accumulation order to the aggregate
    * internals, the lag chain replays identically in the serial
    * oracle. Flat channels (H14 = L14) yield NULL %K and poison the
    * dependent %D to NULL the same way in both engines. */
  def stochastic(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    val wN = w.rowsBetween(-(StochN - 1), 0)
    barsDf(spark, "1Hour", rsiStart, rsiEnd)
      .withColumn("c", (col("close") * 100).cast("bigint"))
      .withColumn("h", (col("high") * 100).cast("bigint"))
      .withColumn("l", (col("low") * 100).cast("bigint"))
      .withColumn("rn", row_number().over(w))
      .withColumn("h14", max(col("h")).over(wN))
      .withColumn("l14", min(col("l")).over(wN))
      .withColumn("k",
        when(col("h14") === col("l14"), lit(null).cast("double"))
          .otherwise((lit(100L) * (col("c") - col("l14"))).cast("double") /
            (col("h14") - col("l14")).cast("double")))
      .withColumn("d",
        (col("k") + lag(col("k"), 1).over(w) + lag(col("k"), 2).over(w)) /
          lit(3.0))
      .filter(col("rn") >= StochN + 2) // full %K lookback AND 3 %K values
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("bar_time"),
        col("h14"), col("l14"), col("k"), col("d"))
      .orderBy(col("symbol"), col("bar_time"))
  }

  def stochasticSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val bs = AlpacaFixtures.bars(s, us(rsiStart), us(rsiEnd), Hour)
      val cents = bs.map(b =>
        ((b.close * 100).toLong, (b.high * 100).toLong, (b.low * 100).toLong))
      val ks: Seq[Option[Double]] = cents.indices.map { j =>
        if (j < StochN - 1) None
        else {
          val win = cents.slice(j - (StochN - 1), j + 1)
          val h14 = win.map(_._2).max
          val l14 = win.map(_._3).min
          if (h14 == l14) None
          else Some((100L * (cents(j)._1 - l14)).toDouble / (h14 - l14).toDouble)
        }
      }
      (StochN + 1 until bs.size).map { j =>
        val win = cents.slice(j - (StochN - 1), j + 1)
        val h14 = win.map(_._2).max
        val l14 = win.map(_._3).min
        val kLit = ks(j).map(fmtDExact).getOrElse("CAST(NULL AS DOUBLE)")
        // the same fixed chain: k + k-1 + k-2, then one divide
        val dLit = (ks(j), ks(j - 1), ks(j - 2)) match {
          case (Some(a), Some(b), Some(c)) => fmtDExact((a + b + c) / 3.0)
          case _ => "CAST(NULL AS DOUBLE)"
        }
        s"(${sqlStr(s)}, ${sqlStr(fmtTs(bs(j).timeUs))}, $h14, $l14, $kLit, $dLit)"
      }
    }
    s"""SELECT symbol, bar_time, CAST(h14 AS BIGINT) AS h14,
       |  CAST(l14 AS BIGINT) AS l14, CAST(k AS DOUBLE) AS k,
       |  CAST(d AS DOUBLE) AS d
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, bar_time, h14, l14, k, d)
       |ORDER BY symbol, bar_time""".stripMargin
  }

  // ------------------------------------------------- range-based vol
  /** Range-based volatility estimators — Parkinson, Garman–Klass and
    * Rogers–Satchell — the OHLC estimators a risk desk runs instead of
    * close-to-close variance (5–8× more efficient per Parkinson 1980 /
    * Garman–Klass 1980). Daily OHLC is RESAMPLED from hourly bars in
    * the same plan (min_by/max_by open/close, max/min high/low), so
    * the gate is the real two-level shape: per-(symbol, day) partial
    * aggregation, per-day cent-exact BIGINT range terms, then a
    * per-symbol rollup whose shuffle carries |symbol-days| rows. The
    * final estimator values are fixed chains of 2–3 IEEE ops over
    * exact integer sums (constants embedded from the same Scala
    * expressions the oracle uses), so hash parity holds with no
    * tolerance. Units: cents²/day. */
  def rangeVol(spark: SparkSession, dir: String): DataFrame = {
    val daily = barsDf(spark, "1Hour", volStart, volEnd)
      .withColumn("day", date_format(col("time"), "yyyy-MM-dd"))
      .select(col("symbol"), col("day"), col("time"),
        (col("open") * 100).cast("bigint").as("o_c"),
        (col("high") * 100).cast("bigint").as("h_c"),
        (col("low") * 100).cast("bigint").as("l_c"),
        (col("close") * 100).cast("bigint").as("c_c"))
      .groupBy(col("symbol"), col("day"))
      .agg(min_by(col("o_c"), col("time")).as("o"),
        max(col("h_c")).as("h"),
        min(col("l_c")).as("l"),
        max_by(col("c_c"), col("time")).as("c"))
    daily
      .withColumn("hl", col("h") - col("l"))
      .withColumn("co", col("c") - col("o"))
      .withColumn("rs_term",
        (col("h") - col("o")) * (col("h") - col("c")) +
          (col("l") - col("o")) * (col("l") - col("c")))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("hl") * col("hl")).as("s_hl2"),
        sum(col("co") * col("co")).as("s_co2"),
        sum(col("rs_term")).as("s_rs"))
      .withColumn("parkinson_var",
        (col("s_hl2").cast("double") / col("n_days").cast("double")) /
          lit(4.0 * math.log(2.0)))
      .withColumn("gk_var",
        ((lit(0.5) * col("s_hl2").cast("double")) -
          (lit(2.0 * math.log(2.0) - 1.0) * col("s_co2").cast("double"))) /
          col("n_days").cast("double"))
      .withColumn("rs_var", col("s_rs").cast("double") / col("n_days").cast("double"))
      .orderBy(col("symbol"))
  }

  def rangeVolSql: String = {
    val rows = symbols.sorted.map { s =>
      val days = AlpacaFixtures.bars(s, us(volStart), us(volEnd), Hour)
        .groupBy(b => fmtTs(b.timeUs).take(10)).toSeq.sortBy(_._1)
        .map { case (_, bs) =>
          val srt = bs.sortBy(_.timeUs)
          val o = (srt.head.open * 100).toLong
          val h = srt.map(b => (b.high * 100).toLong).max
          val l = srt.map(b => (b.low * 100).toLong).min
          val c = (srt.last.close * 100).toLong
          (o, h, l, c)
        }
      val n = days.size.toLong
      val sHl2 = days.map { case (_, h, l, _) => (h - l) * (h - l) }.sum
      val sCo2 = days.map { case (o, _, _, c) => (c - o) * (c - o) }.sum
      val sRs = days.map { case (o, h, l, c) => (h - o) * (h - c) + (l - o) * (l - c) }.sum
      val park = (sHl2.toDouble / n.toDouble) / (4.0 * math.log(2.0))
      val gk = ((0.5 * sHl2.toDouble) - ((2.0 * math.log(2.0) - 1.0) * sCo2.toDouble)) /
        n.toDouble
      val rsv = sRs.toDouble / n.toDouble
      s"(${sqlStr(s)}, $n, $sHl2, $sCo2, $sRs, ${fmtDExact(park)}, " +
        s"${fmtDExact(gk)}, ${fmtDExact(rsv)})"
    }
    s"""SELECT symbol, CAST(n_days AS BIGINT) AS n_days,
       |  CAST(s_hl2 AS BIGINT) AS s_hl2, CAST(s_co2 AS BIGINT) AS s_co2,
       |  CAST(s_rs AS BIGINT) AS s_rs,
       |  CAST(parkinson_var AS DOUBLE) AS parkinson_var,
       |  CAST(gk_var AS DOUBLE) AS gk_var, CAST(rs_var AS DOUBLE) AS rs_var
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, n_days, s_hl2, s_co2, s_rs, parkinson_var, gk_var, rs_var)
       |ORDER BY symbol""".stripMargin
  }

  // ------------------------------------------------- intraday profile
  /** Hour-of-day liquidity seasonality (the U-shape every execution
    * scheduler calibrates against): volume and trade-count per
    * (symbol, hour-of-day) across days, plus each hour's share of the
    * symbol's total. One partial-aggregable groupBy over the scan; the
    * share is a window over the ALREADY-AGGREGATED 24-rows-per-symbol
    * result, so the window's sort is over |symbols|×24 rows no matter
    * how many years of bars feed it. */
  def intradayProfile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol"))
    barsDf(spark, "1Hour", volStart, volEnd)
      .withColumn("hod", hour(col("time")))
      .groupBy(col("symbol"), col("hod"))
      .agg(sum(col("volume")).as("hour_volume"),
        sum(col("trade_count")).as("hour_trades"),
        count(lit(1)).as("n_bars"))
      .withColumn("volume_share",
        col("hour_volume").cast("double") /
          sum(col("hour_volume")).over(w).cast("double"))
      .orderBy(col("symbol"), col("hod"))
  }

  def intradayProfileSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val bs = AlpacaFixtures.bars(s, us(volStart), us(volEnd), Hour)
      val total = bs.map(_.volume).sum
      bs.groupBy(b => (b.timeUs / Hour % 24).toInt).toSeq.sortBy(_._1)
        .map { case (hod, hb) =>
          val hv = hb.map(_.volume).sum
          s"(${sqlStr(s)}, $hod, $hv, ${hb.map(_.tradeCount).sum}, " +
            s"${hb.size}, ${fmtDExact(hv.toDouble / total.toDouble)})"
        }
    }
    s"""SELECT symbol, CAST(hod AS INT) AS hod,
       |  CAST(hour_volume AS BIGINT) AS hour_volume,
       |  CAST(hour_trades AS BIGINT) AS hour_trades,
       |  CAST(n_bars AS BIGINT) AS n_bars,
       |  CAST(volume_share AS DOUBLE) AS volume_share
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, hod, hour_volume, hour_trades, n_bars, volume_share)
       |ORDER BY symbol, hod""".stripMargin
  }

  // ------------------------------------------------- feature corr matrix
  /** Per-symbol correlation matrix over daily features — the
    * risk-model/feature-engineering matrix in its GRAM form: the
    * features (Δclose, Δvolume, Δtrade_count) are row-aligned (one
    * row per day carries all three), so every pairwise co-moment is a
    * plain product of that row's own columns and the whole matrix is
    * ONE partial-aggregable pass — no melt, no self-join, no second
    * scan (the first cut melted + self-joined and the golden showed
    * scan=2: the connector fetched every page twice to join a table
    * to itself). The aggregated sums then unpivot into C(F,2) pair
    * rows via stack — a Generate over |symbols| rows, not data.
    * Pearson r is a fixed chain over exact BIGINT sums (two
    * correctly-rounded sqrts + one divide). The melt+join shape is
    * only right when features live in DIFFERENT rows; row-aligned
    * matrices at any F compute this way (at F ~ 10³ the sums move to
    * a treeAggregate Gram accumulator — the k-means boundary in
    * SCALE.md). Cross-SYMBOL return correlation is deliberately NOT a
    * gate: the stub's price walk is symbol-shifted-identical, so
    * every pair would be exactly 1 — a vacuous oracle; the three
    * features have genuinely different generating cycles (16/100/20)
    * and non-trivial r. */
  /** 120 days: long enough that every feature's generating cycle
    * (16/100/20 days) wraps at least once — inside one cycle Δvolume
    * is CONSTANT (zero variance ⇒ r undefined, ANSI divide-by-zero). */
  private val corrStart = "2021-02-01T00:00:00Z"
  private val corrEnd = "2021-06-01T00:00:00Z"

  def featureCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("time"))
    // canonical feature order: d_close < d_trades < d_volume (the
    // stack below emits upper-triangle pairs in this order)
    val feats = barsDf(spark, "1Day", corrStart, corrEnd)
      .select(col("symbol"), col("time"),
        (col("close") * 100).cast("bigint").as("c_c"),
        col("volume"), col("trade_count"))
      .withColumn("ret", col("c_c") - lag(col("c_c"), 1).over(w))
      .withColumn("dvol", col("volume") - lag(col("volume"), 1).over(w))
      .withColumn("dtc", col("trade_count") - lag(col("trade_count"), 1).over(w))
      .filter(col("ret").isNotNull)
    feats.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        sum(col("ret")).as("s_ret"), sum(col("dtc")).as("s_dtc"),
        sum(col("dvol")).as("s_dvol"),
        sum(col("ret") * col("ret")).as("s_ret2"),
        sum(col("dtc") * col("dtc")).as("s_dtc2"),
        sum(col("dvol") * col("dvol")).as("s_dvol2"),
        sum(col("ret") * col("dtc")).as("s_ret_dtc"),
        sum(col("ret") * col("dvol")).as("s_ret_dvol"),
        sum(col("dtc") * col("dvol")).as("s_dtc_dvol"))
      .select(col("symbol"), col("n"), expr(
        """stack(3,
          |  'd_close', 'd_trades', s_ret, s_dtc, s_ret_dtc, s_ret2, s_dtc2,
          |  'd_close', 'd_volume', s_ret, s_dvol, s_ret_dvol, s_ret2, s_dvol2,
          |  'd_trades', 'd_volume', s_dtc, s_dvol, s_dtc_dvol, s_dtc2, s_dvol2
          |) AS (fa, fb, sx, sy, sxy, sxx, syy)""".stripMargin))
      .withColumn("corr_r",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
      .select(col("symbol"), col("fa"), col("fb"), col("n"),
        col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"), col("corr_r"))
      .orderBy(col("symbol"), col("fa"), col("fb"))
  }

  def featureCorrMatrixSql: String = {
    val rows = symbols.sorted.flatMap { s =>
      val bs = AlpacaFixtures.bars(s, us(corrStart), us(corrEnd), Day).sortBy(_.timeUs)
      val feats = bs.zip(bs.tail).map { case (p, q) =>
        Map(
          "d_close" -> ((q.close * 100).toLong - (p.close * 100).toLong),
          "d_trades" -> (q.tradeCount - p.tradeCount),
          "d_volume" -> (q.volume - p.volume))
      }
      val names = Seq("d_close", "d_trades", "d_volume")
      for {
        i <- names.indices; j <- names.indices if names(i) < names(j)
      } yield {
        val xs = feats.map(_(names(i))); val ys = feats.map(_(names(j)))
        val n = xs.size.toLong
        val sx = xs.sum; val sy = ys.sum
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
        val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
        val r = (n * sxy - sx * sy).toDouble /
          (math.sqrt((n * sxx - sx * sx).toDouble) *
            math.sqrt((n * syy - sy * sy).toDouble))
        s"(${sqlStr(s)}, ${sqlStr(names(i))}, ${sqlStr(names(j))}, $n, $sx, $sy, " +
          s"$sxy, $sxx, $syy, ${fmtDExact(r)})"
      }
    }
    s"""SELECT symbol, fa, fb, CAST(n AS BIGINT) AS n,
       |  CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
       |  CAST(sxy AS BIGINT) AS sxy, CAST(sxx AS BIGINT) AS sxx,
       |  CAST(syy AS BIGINT) AS syy, CAST(corr_r AS DOUBLE) AS corr_r
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, fa, fb, n, sx, sy, sxy, sxx, syy, corr_r)
       |ORDER BY symbol, fa, fb""".stripMargin
  }

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(

    "alpaca_adjusted_bars" -> ((adjustedBars _, adjustedBarsSql)),
    "alpaca_range_vol" -> ((rangeVol _, rangeVolSql)),
    "alpaca_intraday_profile" -> ((intradayProfile _, intradayProfileSql)),
    "alpaca_feature_corr_matrix" -> ((featureCorrMatrix _, featureCorrMatrixSql)),
    "alpaca_vwap_daily" -> ((vwapDaily _, vwapDailySql)),
    "alpaca_sma_crossover" -> ((smaCrossover _, smaCrossoverSql)),
    "alpaca_daily_returns" -> ((dailyReturns _, dailyReturnsSql)),
    "alpaca_return_summary" -> ((returnSummary _, returnSummarySql)),
    "alpaca_volatility" -> ((volatilityDaily _, volatilityDailySql)),
    "alpaca_drawdown" -> ((drawdown _, drawdownSql)),
    "alpaca_rsi" -> ((rsi _, rsiSql)),
    "alpaca_bollinger" -> ((bollinger _, bollingerSql)),
    "alpaca_ewma" -> ((ewma _, ewmaSql)),
    "alpaca_stream_ewma" -> ((streamEwma _, ewmaSql)),
    "alpaca_atr" -> ((atr _, atrSql)),
    "alpaca_obv" -> ((obv _, obvSql)),
    "alpaca_stochastic" -> ((stochastic _, stochasticSql)),
    "alpaca_mfi" -> ((mfi _, mfiSql)))
}
