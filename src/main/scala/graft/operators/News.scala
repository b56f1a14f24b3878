package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.stub.AlpacaFixtures

/**
 * News-source gates — the text side of the connector (SURVEY §2.13:
 * `Alpaca_News`, v1beta1, no reference twin). The news envelope is the
 * API's one FLAT page shape, so these gates also pin the flat-array
 * parse branch and its per-requested-symbol fan-out semantics; the
 * dedup and quality gates then run the text-curation discipline over
 * connector-fetched text — the bridge between the repo's two halves.
 */
object News {
  import AlpacaQueries.{baseOptions, us, fmtTs, sqlStr}

  private val newsSymbols = Seq("AAPL", "MSFT")
  private val newsStart = "2021-01-04T00:00:00Z"
  private val newsScanEnd = "2021-01-04T06:00:00Z"
  private val newsEnd = "2021-01-05T00:00:00Z"

  private def newsDf(spark: SparkSession, symbols: Seq[String],
      end: String): DataFrame =
    spark.read.format("Alpaca_News")
      .options(baseOptions(symbols: _*) ++ Map(
        "start" -> newsStart, "end" -> end))
      .load()

  /** Full-scan projection, single symbol (12 articles over 6h:
    * macro stories, nullable updated_at, contentless articles all
    * appear on schedule). */
  def newsScan(spark: SparkSession, dir: String): DataFrame =
    newsDf(spark, Seq("AAPL"), newsScanEnd)
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("created"),
        date_format(col("updated_at"), "yyyy-MM-dd HH:mm:ss").as("updated"),
        col("id"), col("headline"), col("author"), col("summary"),
        col("content"), col("symbols"), col("source"), col("url"))
      .orderBy(col("id"))

  private def newsRowsSql(symbols: Seq[String], endIso: String,
      dedup: Boolean): String = {
    var seen = Set.empty[Long]
    val rows = symbols.sorted.flatMap { s =>
      AlpacaFixtures.newsArticles(s, us(newsStart), us(endIso)).flatMap { a =>
        if (dedup && seen.contains(a.id)) None
        else {
          seen += a.id
          val upd = a.updatedUs.map(u => sqlStr(fmtTs(u))).getOrElse("NULL")
          Some(s"(${sqlStr(s)}, ${sqlStr(fmtTs(a.timeUs))}, $upd, ${a.id}, " +
            s"${sqlStr(a.headline)}, ${sqlStr(a.author)}, ${sqlStr(a.summary)}, " +
            s"${sqlStr(a.content)}, ${sqlStr(a.symbols.mkString(","))}, " +
            s"${sqlStr(a.source)}, ${sqlStr(a.url)})")
        }
      }
    }
    s"""(VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, created, updated, id, headline, author, summary,
       |       content, symbols, source, url)""".stripMargin
  }

  def newsScanSql: String =
    s"""SELECT symbol, created, updated, CAST(id AS BIGINT) AS id, headline,
       |  author, summary, content, symbols, source, url
       |FROM ${newsRowsSql(Seq("AAPL"), newsScanEnd, dedup = false)}
       |ORDER BY id""".stripMargin

  /** The same scan through the connector's micro-batch stream (the
    * flat envelope rides the identical page source) — shares the
    * batch oracle. */
  def newsStreamScan(spark: SparkSession, dir: String): DataFrame = {
    val stream = spark.readStream.format("Alpaca_News")
      .options(baseOptions("AAPL") ++ Map(
        "start" -> newsStart, "end" -> newsScanEnd, "stream_step" -> "2Hours"))
      .load()
    Streaming.drainToTable(spark, stream, "append")
      .select(col("symbol"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("created"),
        date_format(col("updated_at"), "yyyy-MM-dd HH:mm:ss").as("updated"),
        col("id"), col("headline"), col("author"), col("summary"),
        col("content"), col("symbols"), col("source"), col("url"))
      .orderBy(col("id"))
  }

  /** Dedup-by-id over the per-symbol fan-out: querying BOTH symbols
    * fetches each MACRO article once per requested-symbol partition
    * (the documented flat-envelope semantic); the gate groups by id,
    * counts the copies, and keeps one row — exact-dedup discipline
    * (`dedup_exact`) applied at the connector boundary. Copy counts
    * are part of the output so the fan-out itself is verified: macro
    * ids must show 2 copies, single-listed ids 1. */
  def newsDedup(spark: SparkSession, dir: String): DataFrame =
    newsDf(spark, newsSymbols, newsEnd)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("symbol")).as("first_symbol"),
        max(col("headline")).as("headline"),
        max(col("symbols")).as("symbols"))
      .orderBy(col("id"))

  def newsDedupSql: String = {
    val all = newsSymbols.sorted.flatMap { s =>
      AlpacaFixtures.newsArticles(s, us(newsStart), us(newsEnd)).map(s -> _)
    }
    val rows = all.map { case (s, a) =>
      s"(${sqlStr(s)}, ${a.id}, ${sqlStr(a.headline)}, " +
        s"${sqlStr(a.symbols.mkString(","))})"
    }
    s"""SELECT id, COUNT(*) AS n_copies, MIN(symbol) AS first_symbol,
       |  MAX(headline) AS headline, MAX(symbols) AS symbols
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS v(symbol, id, headline, symbols)
       |GROUP BY id ORDER BY id""".stripMargin
  }

  private val NewsStops = Seq("the", "and", "is", "it")

  /** Text-quality ratios over connector-fetched summaries — the
    * curation bridge: dedup by id first (min-symbol copy wins), then
    * the same ratio discipline as `text_quality` (word count, mean
    * word length, stopword ratio; integer-derived single divisions).
    * At scale this is the exact shape of a news-ingest curation pass:
    * dedup on the article key, score, filter downstream. */
  def newsQuality(spark: SparkSession, dir: String): DataFrame = {
    val inList = NewsStops.map(s => s"'$s'").mkString(", ")
    val deduped = newsDf(spark, newsSymbols, newsEnd)
      .groupBy(col("id"))
      .agg(min(col("symbol")).as("symbol"), max(col("summary")).as("summary"))
    val len = length(col("summary")).cast("double")
    val nWords = size(split(col("summary"), " ")).cast("double")
    val nStop = size(expr(
      s"filter(split(summary, ' '), x -> lower(x) IN ($inList))")).cast("double")
    deduped.select(
        col("id"), col("symbol"),
        nWords.cast("bigint").as("n_words"),
        ((len - (nWords - 1)) / nWords).as("mean_word_len"),
        (nStop / nWords).as("stop_ratio"))
      .orderBy(col("id"))
  }

  def newsQualitySql: String = {
    val inList = NewsStops.map(s => s"'$s'").mkString(", ")
    var seen = Set.empty[Long]
    val rows = newsSymbols.sorted.flatMap { s =>
      AlpacaFixtures.newsArticles(s, us(newsStart), us(newsEnd)).flatMap { a =>
        if (seen.contains(a.id)) None
        else { seen += a.id; Some(s"(${a.id}, ${sqlStr(s)}, ${sqlStr(a.summary)})") }
      }
    }
    val len = "CAST(LENGTH(summary) AS DOUBLE)"
    val nWords = "CAST(LEN(STRING_SPLIT(summary, ' ')) AS DOUBLE)"
    val nStop =
      s"CAST(LEN(LIST_FILTER(STRING_SPLIT(summary, ' '), x -> LOWER(x) IN ($inList))) AS DOUBLE)"
    s"""SELECT CAST(id AS BIGINT) AS id, symbol,
       |  CAST($nWords AS BIGINT) AS n_words,
       |  ($len - ($nWords - 1)) / $nWords AS mean_word_len,
       |  $nStop / $nWords AS stop_ratio
       |FROM (VALUES ${rows.mkString(",\n  ")}) AS v(id, symbol, summary)
       |ORDER BY id""".stripMargin
  }

  /** Streaming curation — the production news-ingest shape end to
    * end: the micro-batch stream over BOTH symbols dedups by id IN
    * FLIGHT (stateful dropDuplicates; a macro article arrives once
    * per requested-symbol partition within the SAME batch and exactly
    * one copy survives), then the drained result takes the quality
    * metrics and the curation cut. The requested-symbol column is
    * dropped BEFORE the dedup — it is the one column that differs
    * between fan-out copies, so keeping it would make the kept row
    * arrival-order-dependent; everything the curation needs is
    * copy-invariant. Production swaps dropDuplicates for
    * dropDuplicatesWithinWatermark to bound state (the stream_dedup
    * gate's documented contract). */
  def streamNewsCurate(spark: SparkSession, dir: String): DataFrame = {
    val inList = NewsStops.map(s => s"'$s'").mkString(", ")
    val stream = spark.readStream.format("Alpaca_News")
      .options(baseOptions(newsSymbols: _*) ++ Map(
        "start" -> newsStart, "end" -> newsEnd, "stream_step" -> "6Hours"))
      .load()
      .select(col("id"), col("time"), col("summary"))
      .dropDuplicates("id")
    val drained = Streaming.drainToTable(spark, stream, "append")
    val len = length(col("summary")).cast("double")
    val nWords = size(split(col("summary"), " ")).cast("double")
    val nStop = size(expr(
      s"filter(split(summary, ' '), x -> lower(x) IN ($inList))")).cast("double")
    drained.select(
        col("id"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("created"),
        nWords.cast("bigint").as("n_words"),
        (nStop / nWords).as("stop_ratio"))
      .filter(col("n_words") >= 12 && col("stop_ratio") < 0.45)
      .orderBy(col("id"))
  }

  def streamNewsCurateSql: String = {
    val inList = NewsStops.map(s => s"'$s'").mkString(", ")
    var seen = Set.empty[Long]
    val rows = newsSymbols.sorted.flatMap { s =>
      AlpacaFixtures.newsArticles(s, us(newsStart), us(newsEnd)).flatMap { a =>
        if (seen.contains(a.id)) None
        else { seen += a.id; Some(s"(${a.id}, ${sqlStr(fmtTs(a.timeUs))}, ${sqlStr(a.summary)})") }
      }
    }
    val nWords = "CAST(LEN(STRING_SPLIT(summary, ' ')) AS DOUBLE)"
    val nStop =
      s"CAST(LEN(LIST_FILTER(STRING_SPLIT(summary, ' '), x -> LOWER(x) IN ($inList))) AS DOUBLE)"
    s"""SELECT CAST(id AS BIGINT) AS id, created,
       |  CAST($nWords AS BIGINT) AS n_words,
       |  $nStop / $nWords AS stop_ratio
       |FROM (VALUES ${rows.mkString(",\n  ")}) AS v(id, created, summary)
       |WHERE $nWords >= 12 AND $nStop / $nWords < 0.45
       |ORDER BY id""".stripMargin
  }

  private val PosWords = Seq("beats", "raises")
  private val NegWords = Seq("misses", "cuts")

  /** Lexicon sentiment index — the news-analytics staple: dedup
    * articles by id, score each headline with a ±1 lexicon (the
    * deterministic stand-in for a model scorer; the Spark-side
    * plumbing — dedup, explode, aggregate — is the real part),
    * EXPLODE the article's full ticker CSV so a cross-listed story
    * counts toward every symbol it names, and aggregate net
    * sentiment per ticker. Integer scores ⇒ exact sums; the ratio is
    * one division. */
  def newsSentiment(spark: SparkSession, dir: String): DataFrame = {
    val pos = PosWords.map(w => s"'$w'").mkString(", ")
    val neg = NegWords.map(w => s"'$w'").mkString(", ")
    newsDf(spark, newsSymbols, newsEnd)
      .groupBy(col("id"))
      .agg(max(col("headline")).as("headline"), max(col("symbols")).as("symbols"))
      .withColumn("score",
        expr(s"size(filter(split(lower(headline), ' '), x -> x IN ($pos)))") -
          expr(s"size(filter(split(lower(headline), ' '), x -> x IN ($neg)))"))
      .select(explode(split(col("symbols"), ",")).as("ticker"), col("score"))
      .groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_articles"),
        sum(col("score")).as("net_sentiment"),
        (sum(col("score")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_sentiment"))
      .orderBy(col("ticker"))
  }

  def newsSentimentSql: String = {
    val pos = PosWords.map(w => s"'$w'").mkString(", ")
    val neg = NegWords.map(w => s"'$w'").mkString(", ")
    var seen = Set.empty[Long]
    val rows = newsSymbols.sorted.flatMap { s =>
      AlpacaFixtures.newsArticles(s, us(newsStart), us(newsEnd)).flatMap { a =>
        if (seen.contains(a.id)) None
        else {
          seen += a.id
          Some(s"(${a.id}, ${sqlStr(a.headline)}, ${sqlStr(a.symbols.mkString(","))})")
        }
      }
    }
    s"""WITH arts AS (
       |  SELECT id, headline, symbols,
       |    CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(headline), ' '), x -> x IN ($pos))) AS BIGINT) -
       |    CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(headline), ' '), x -> x IN ($neg))) AS BIGINT) AS score
       |  FROM (VALUES ${rows.mkString(",\n  ")}) AS v(id, headline, symbols)),
       |exploded AS (
       |  SELECT UNNEST(STRING_SPLIT(symbols, ',')) AS ticker, score FROM arts)
       |SELECT ticker, CAST(COUNT(*) AS BIGINT) AS n_articles,
       |  CAST(SUM(score) AS BIGINT) AS net_sentiment,
       |  CAST(SUM(score) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_sentiment
       |FROM exploded
       |GROUP BY ticker
       |ORDER BY ticker""".stripMargin
  }

  /** News → price bridge — the event-study form of news alpha
    * research: each deduped, lexicon-scored article anchors to its
    * containing hour and the NEXT-hour close-to-close move (exact
    * cents) is attributed to its sentiment sign. Both bar lookups
    * are EQUI-joins on (symbol, hour) — the news grid never needs a
    * range join — and the final per-sign aggregate is partial. The
    * bars window extends one hour past the news window so the last
    * article's forward bar exists. */
  def newsReturn(spark: SparkSession, dir: String): DataFrame = {
    val pos = PosWords.map(w => s"'$w'").mkString(", ")
    val neg = NegWords.map(w => s"'$w'").mkString(", ")
    val barsEndPlus = "2021-01-05T01:00:00Z" // newsEnd + the forward hour
    val bars = spark.read.format("Alpaca_Stocks_Bars")
      .options(baseOptions(newsSymbols: _*) ++ Map(
        "timeframe" -> "1Hour", "start" -> newsStart, "end" -> barsEndPlus))
      .load()
      .select(col("symbol").as("ticker"),
        expr("unix_micros(time) div 3600000000").as("hr"),
        (col("close") * 100).cast("bigint").as("close_c"))
    val scored = newsDf(spark, newsSymbols, newsEnd)
      .groupBy(col("id"))
      .agg(min(col("time")).as("time"), max(col("headline")).as("headline"),
        max(col("symbols")).as("symbols"))
      .withColumn("score",
        expr(s"size(filter(split(lower(headline), ' '), x -> x IN ($pos)))") -
          expr(s"size(filter(split(lower(headline), ' '), x -> x IN ($neg)))"))
      .select(explode(split(col("symbols"), ",")).as("ticker"),
        expr("unix_micros(time) div 3600000000").as("hr"),
        signum(col("score")).cast("int").as("sign"))
    scored
      .join(bars, Seq("ticker", "hr"))
      .join(bars
        .withColumnRenamed("close_c", "next_close_c")
        .withColumn("hr", col("hr") - 1), Seq("ticker", "hr"))
      .groupBy(col("sign"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("next_close_c") - col("close_c")).as("sum_ret_cents"),
        (sum(col("next_close_c") - col("close_c")).cast("double") /
          count(lit(1)).cast("double")).as("mean_ret_cents"))
      .orderBy(col("sign"))
  }

  def newsReturnSql: String = {
    val Hour = 3600L * 1000000L
    var seen = Set.empty[Long]
    val events = newsSymbols.sorted.flatMap { s =>
      AlpacaFixtures.newsArticles(s, us(newsStart), us(newsEnd)).flatMap { a =>
        if (seen.contains(a.id)) None
        else {
          seen += a.id
          val words = a.headline.toLowerCase.split(' ')
          val score = words.count(PosWords.contains) - words.count(NegWords.contains)
          Some((a, score.sign))
        }
      }
    }
    val rows = events.flatMap { case (a, sign) =>
      a.symbols.map { tk =>
        val hr = a.timeUs / Hour
        val c0 = (AlpacaFixtures.barAt(tk, hr * Hour, Hour).close * 100).toLong
        val c1 = (AlpacaFixtures.barAt(tk, (hr + 1) * Hour, Hour).close * 100).toLong
        s"($sign, ${c1 - c0})"
      }
    }
    s"""SELECT CAST(sign AS INT) AS sign, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(ret) AS BIGINT) AS sum_ret_cents,
       |  CAST(SUM(ret) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_ret_cents
       |FROM (VALUES ${rows.mkString(",\n  ")}) AS v(sign, ret)
       |GROUP BY sign
       |ORDER BY sign""".stripMargin
  }

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "alpaca_news_scan" -> ((newsScan _, newsScanSql)),
    "alpaca_news_return" -> ((newsReturn _, newsReturnSql)),
    "alpaca_news_sentiment" -> ((newsSentiment _, newsSentimentSql)),
    "alpaca_stream_news_curate" -> ((streamNewsCurate _, streamNewsCurateSql)),
    "alpaca_news_stream_scan" -> ((newsStreamScan _, newsScanSql)),
    "alpaca_news_dedup" -> ((newsDedup _, newsDedupSql)),
    "alpaca_news_quality" -> ((newsQuality _, newsQualitySql)))
}
