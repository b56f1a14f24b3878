package graft.stub

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.core.{AlpacaOptions, Timeframe}

/**
 * Deterministic Alpaca-API fixture data, shared by the in-process HTTP
 * stub and the DuckDB VALUES-oracle generator so both sides compute the
 * identical rows from the same pure functions. All numeric values sit
 * on a 0.25 grid (exact in binary floating point) so literals round-trip
 * bit-exactly through JSON, Spark and DuckDB.
 *
 * Response envelope mirrors the reference's fixtures
 * (`tests/fixtures/mock_responses.py`):
 * `{ "<data_key>": { "<SYMBOL>": [record…] }, "next_page_token": … }`.
 * Records are emitted for timestamps in the half-open [start, end), so
 * the connector's contiguous partitions tile without duplication.
 */
object AlpacaFixtures {
  case class Bar(symbol: String, timeUs: Long, open: Double, high: Double,
      low: Double, close: Double, volume: Long, tradeCount: Long, vwap: Double)
  case class Trade(symbol: String, timeUs: Long, exchange: String, price: Double,
      size: Long, conditions: Seq[String], id: Long, tape: String)
  case class CryptoTrade(symbol: String, timeUs: Long, price: Double,
      size: Double, id: Long, takerSide: String)
  case class CryptoQuote(symbol: String, timeUs: Long, bidPrice: Double,
      bidSize: Double, askPrice: Double, askSize: Double)
  case class StockQuote(symbol: String, timeUs: Long, askExchange: String,
      askPrice: Double, askSize: Long, bidExchange: String, bidPrice: Double,
      bidSize: Long, conditions: Seq[String], tape: String)
  case class OptionTrade(symbol: String, timeUs: Long, exchange: String,
      price: Double, size: Long, condition: String)
  case class OptionQuote(symbol: String, timeUs: Long, askExchange: String,
      askPrice: Double, askSize: Long, bidExchange: String, bidPrice: Double,
      bidSize: Long, condition: String)
  case class CorpAction(symbol: String, exDateUs: Option[Long],
      recordDateUs: Option[Long], payableDateUs: Option[Long], tpe: String,
      amount: Double, ratio: Double, newSymbol: String, oldSymbol: String)

  private val Micros = 1000000L
  val HourUs: Long = 3600L * Micros
  val DayUs: Long = 24L * HourUs

  private def symBase(symbol: String): Double =
    100.0 + (math.abs(symbol.hashCode) % 64) * 0.25

  /** First grid point ≥ startUs for step `stepUs`. */
  def gridFirst(startUs: Long, stepUs: Long): Long =
    ((startUs + stepUs - 1) / stepUs) * stepUs

  /** Number of grid points in [startUs, endUs). */
  def gridCount(startUs: Long, endUs: Long, stepUs: Long): Int = {
    val first = gridFirst(startUs, stepUs)
    if (endUs <= first) 0 else ((endUs - first + stepUs - 1) / stepUs).toInt
  }

  /** The bar at grid time `t` (pure function of symbol and t). */
  def barAt(symbol: String, t: Long, tfUs: Long): Bar = {
    val i = t / tfUs
    val base = symBase(symbol) + (i % 16) * 0.25
    Bar(symbol, t,
      open = base, high = base + 1.5, low = base - 0.75, close = base + 0.5,
      volume = 1000L + (i % 100) * 10L,
      tradeCount = 50L + (i % 20),
      vwap = base + 0.25)
  }

  /** Bars on the timeframe grid within [startUs, endUs). */
  def bars(symbol: String, startUs: Long, endUs: Long, tfUs: Long): Seq[Bar] = {
    val first = gridFirst(startUs, tfUs)
    Iterator.iterate(first)(_ + tfUs).takeWhile(_ < endUs)
      .map(barAt(symbol, _, tfUs)).toSeq
  }

  /** Trades every 10 minutes within [startUs, endUs). */
  def trades(symbol: String, startUs: Long, endUs: Long): Seq[Trade] = {
    val step = 600L * Micros
    val first = ((startUs + step - 1) / step) * step
    val conds = Seq(Seq.empty[String], Seq("@"), Seq("@", "I"), Seq("F", "T"))
    Iterator.iterate(first)(_ + step).takeWhile(_ < endUs).map { t =>
      val i = t / step
      Trade(symbol, t,
        exchange = ("VNQ" (((i % 3)).toInt)).toString,
        price = symBase(symbol) + (i % 32) * 0.25,
        size = 100L + (i % 50) * 10L,
        conditions = conds((i % 4).toInt),
        id = 10000L + i,
        tape = ("ABC" (((i % 3)).toInt)).toString)
    }.toSeq
  }

  /** Crypto trades every 5 minutes within [startUs, endUs): fractional
    * sizes on the exact 0.25 grid, alternating taker side. */
  def cryptoTrades(symbol: String, startUs: Long, endUs: Long): Seq[CryptoTrade] = {
    val step = 300L * Micros
    val first = ((startUs + step - 1) / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ < endUs).map { t =>
      val i = t / step
      CryptoTrade(symbol, t,
        price = symBase(symbol) * 100.0 + (i % 64) * 0.25,
        size = 0.25 + (i % 16) * 0.25,
        id = 20000L + i,
        takerSide = if (i % 2 == 0) "B" else "S")
    }.toSeq
  }

  /** Crypto quotes every 2 minutes within [startUs, endUs): spread of
    * exactly 0.5 around the trade-price walk, sizes on the 0.25 grid. */
  def cryptoQuotes(symbol: String, startUs: Long, endUs: Long): Seq[CryptoQuote] = {
    val step = 120L * Micros
    val first = ((startUs + step - 1) / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ < endUs).map { t =>
      val i = t / step
      val mid = symBase(symbol) * 100.0 + (i % 64) * 0.25
      CryptoQuote(symbol, t,
        bidPrice = mid - 0.25,
        bidSize = 0.5 + (i % 8) * 0.25,
        askPrice = mid + 0.25,
        askSize = 0.25 + (i % 12) * 0.25)
    }.toSeq
  }

  /** Stock NBBO quotes every 3 minutes within [startUs, endUs):
    * a varying 0.5/0.75/1.0 spread (exact 0.25 grid) around the
    * symbol walk, round-lot integer sizes, cycling
    * exchanges/conditions/tapes like trades. */
  def stockQuotes(symbol: String, startUs: Long, endUs: Long): Seq[StockQuote] = {
    val step = 180L * Micros
    val first = ((startUs + step - 1) / step) * step
    val conds = Seq(Seq.empty[String], Seq("R"), Seq("R", "O"))
    Iterator.iterate(first)(_ + step).takeWhile(_ < endUs).map { t =>
      val i = t / step
      val mid = symBase(symbol) + (i % 24) * 0.25
      val halfSpread = 0.25 + (i % 3) * 0.125
      StockQuote(symbol, t,
        askExchange = ("VNQ" (((i % 3)).toInt)).toString,
        askPrice = mid + halfSpread,
        askSize = 100L + (i % 10) * 100L,
        bidExchange = ("QNV" (((i % 3)).toInt)).toString,
        bidPrice = mid - halfSpread,
        bidSize = 200L + (i % 8) * 100L,
        conditions = conds((i % 3).toInt),
        tape = ("ABC" (((i % 3)).toInt)).toString)
    }.toSeq
  }

  /** Option trades every 15 minutes within [startUs, endUs): premium
    * walk on the 0.25 grid, integer contract sizes, a scalar sale
    * condition cycling through ""/"I"/"S" (empty third omits the `c`
    * key entirely when rendered — exercises optional-key defaulting). */
  def optionTrades(symbol: String, startUs: Long, endUs: Long): Seq[OptionTrade] = {
    val step = 900L * Micros
    val first = ((startUs + step - 1) / step) * step
    val conds = Seq("", "I", "S")
    Iterator.iterate(first)(_ + step).takeWhile(_ < endUs).map { t =>
      val i = t / step
      OptionTrade(symbol, t,
        exchange = ("ACB" (((i % 3)).toInt)).toString,
        price = 2.0 + (math.abs(symbol.hashCode) % 16) * 0.25 + (i % 20) * 0.25,
        size = 1L + (i % 10),
        condition = conds((i % 3).toInt))
    }.toSeq
  }

  /** Option NBBO quotes every 5 minutes within [startUs, endUs): a
    * 0.25/0.5 half-spread around the premium walk, small integer
    * contract sizes, scalar condition cycling ""/"A"/"B"/"O". */
  def optionQuotes(symbol: String, startUs: Long, endUs: Long): Seq[OptionQuote] = {
    val step = 300L * Micros
    val first = ((startUs + step - 1) / step) * step
    val conds = Seq("", "A", "B", "O")
    Iterator.iterate(first)(_ + step).takeWhile(_ < endUs).map { t =>
      val i = t / step
      val mid = 2.5 + (math.abs(symbol.hashCode) % 16) * 0.25 + (i % 12) * 0.25
      val halfSpread = 0.25 + (i % 2) * 0.25
      OptionQuote(symbol, t,
        askExchange = ("ACB" (((i % 3)).toInt)).toString,
        askPrice = mid + halfSpread,
        askSize = 5L + (i % 20),
        bidExchange = ("BCA" (((i % 3)).toInt)).toString,
        bidPrice = mid - halfSpread,
        bidSize = 3L + (i % 15),
        condition = conds((i % 4).toInt))
    }.toSeq
  }

  /** Multi-venue stock quotes (symbols prefixed "MV"): every 3-minute
    * step emits one quote per venue V/N/Q at the SAME instant, with
    * venue-dependent bid/ask offsets on the 0.25 grid — the
    * consolidated-tape shape an NBBO computation needs (the
    * single-venue fixture above never has two quotes per instant).
    * Offsets cycle so the best venue rotates and bid/ask ties occur
    * on a known schedule. */
  def stockQuotesMulti(symbol: String, startUs: Long, endUs: Long): Seq[StockQuote] = {
    val step = 180L * Micros
    val first = ((startUs + step - 1) / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ < endUs).flatMap { t =>
      val i = t / step
      val mid = symBase(symbol) + (i % 24) * 0.25
      (0 until 3).map { v =>
        StockQuote(symbol, t,
          askExchange = ("VNQ" (v)).toString,
          askPrice = mid + 0.25 * (1 + ((i + 2 * v) % 3)),
          askSize = 100L + v * 100L,
          bidExchange = ("VNQ" (v)).toString,
          bidPrice = mid - 0.25 * (1 + ((i + v) % 3)),
          bidSize = 200L + v * 100L,
          conditions = Seq("R"),
          tape = ("ABC" (((i % 3)).toInt)).toString)
      }
    }.toSeq
  }

  case class NewsArticle(timeUs: Long, updatedUs: Option[Long], id: Long,
      headline: String, author: String, summary: String, content: String,
      symbols: Seq[String], source: String, url: String)

  private val NewsVerbs = Seq("beats", "misses", "raises", "cuts", "holds", "reviews")
  private val NewsObjects = Seq("guidance", "estimates", "the outlook", "targets")
  private val NewsAuthors = Seq("A. Chen", "B. Rivera", "C. Okafor")

  /** One article per 30 minutes within [startUs, endUs). Every 6th
    * slot (i % 6 == 0) is a MACRO story whose id/headline/symbols do
    * NOT depend on the requested symbol and whose ticker list carries
    * both fixture symbols — querying N symbols returns it once PER
    * requested symbol through the per-symbol partition grid,
    * exercising the flat-envelope dedup-by-id contract. Every 5th has
    * no updated_at (nullable path); every 7th an empty content
    * (contentless path). Summaries carry stopwords on purpose — the
    * text-quality gate runs real ratios over them. */
  def newsArticles(symbol: String, startUs: Long, endUs: Long): Seq[NewsArticle] = {
    val step = 1800L * Micros
    val first = ((startUs + step - 1) / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ < endUs).map { t =>
      val i = t / step
      val isMacro = i % 6 == 0
      val subject = if (isMacro) "Markets" else symbol
      val id =
        if (isMacro) 900000L + i
        else 100000L + (math.abs(symbol.hashCode) % 97).toLong * 10000L + i
      val headline = s"$subject ${NewsVerbs((i % 6).toInt)} ${NewsObjects((i % 4).toInt)}"
      val summary = s"The $subject story: it ${NewsVerbs((i % 6).toInt)} " +
        s"${NewsObjects((i % 4).toInt)} and the street is watching closely."
      NewsArticle(t,
        updatedUs = if (i % 5 == 0) None else Some(t + 600L * Micros),
        id = id,
        headline = headline,
        author = NewsAuthors((i % 3).toInt),
        summary = summary,
        content = if (i % 7 == 0) "" else s"<p>$summary</p><p>$headline.</p>",
        symbols = if (isMacro) Seq("AAPL", "MSFT") else Seq(symbol),
        source = "benzinga",
        url = s"https://example.com/news/$id")
    }.toSeq
  }

  case class AuctionPrint(timeUs: Long, exchange: String, price: Double,
      size: Long, condition: String)
  case class AuctionDay(dateUs: Long, opens: Seq[AuctionPrint],
      closes: Seq[AuctionPrint])

  /** Daily auction records for days whose prints fall in
    * [startUs, endUs). Opening print at 14:30Z (plus a 15:00Z
    * reopening every 3rd day — the in-record fan-out the parser must
    * flatten), closing print at 21:00Z. Every 4th day has NO closing
    * auction (half-day: the `c` key is omitted from the JSON
    * entirely) and every 5th day NO opening prints (halted open:
    * empty `o` array) — together they exercise both absent-array
    * shapes. Prices ride the symbol walk on the exact 0.25 grid;
    * condition cycles the real O/M/6 auction codes. */
  def auctionDays(symbol: String, startUs: Long, endUs: Long): Seq[AuctionDay] = {
    val firstDay = (startUs / DayUs) * DayUs // floor: late-day prints of a partial first day
    Iterator.iterate(firstDay)(_ + DayUs).takeWhile(_ < endUs).flatMap { d =>
      val i = d / DayUs
      val base = symBase(symbol) + (i % 16) * 0.25
      def in(t: Long) = t >= startUs && t < endUs
      val opens =
        if (i % 5 == 0) Seq.empty
        else {
          val primary = AuctionPrint(d + 14L * HourUs + 1800L * 1000000L,
            ("NQV" (((i % 3)).toInt)).toString, base, 5000L + (i % 10) * 500L, "O")
          val reopen =
            if (i % 3 == 0)
              Seq(AuctionPrint(d + 15L * HourUs, "N", base + 0.25,
                1000L + (i % 4) * 250L, "6"))
            else Seq.empty
          (primary +: reopen).filter(p => in(p.timeUs))
        }
      val closes =
        if (i % 4 == 0) Seq.empty
        else Seq(AuctionPrint(d + 21L * HourUs,
          ("QNV" (((i % 3)).toInt)).toString, base + 0.5,
          8000L + (i % 8) * 500L, "M")).filter(p => in(p.timeUs))
      if (opens.isEmpty && closes.isEmpty) None
      else Some(AuctionDay(d, opens, closes))
    }.toSeq
  }

  /** The stub's frozen "now" for point-in-time snapshots: midnight
    * 2021-01-05Z, one day into the standard fixture ranges — every
    * section derives from the SAME walk the row-stream fixtures use,
    * so snapshot values cross-check against trades/quotes/bars scans. */
  val SnapshotAsofUs: Long = 1609804800000000L // 2021-01-05T00:00:00Z
  val MinuteUs: Long = 60L * Micros

  case class Snapshot(symbol: String, latestTrade: Trade,
      latestQuote: StockQuote, minuteBar: Bar, dailyBar: Bar,
      prevDailyBar: Option[Bar])

  /** Latest trade/quote = last fixture record before asof; minute bar
    * = the asof-preceding minute; daily = the completed asof-preceding
    * day. Symbols with hash % 3 == 0 have NO prevDailyBar (the
    * new-listing shape — exercises the absent-section null path). */
  def snapshot(symbol: String): Snapshot = {
    val asof = SnapshotAsofUs
    Snapshot(symbol,
      latestTrade = trades(symbol, asof - DayUs, asof).last,
      latestQuote = stockQuotes(symbol, asof - DayUs, asof).last,
      minuteBar = barAt(symbol, asof - MinuteUs, MinuteUs),
      dailyBar = barAt(symbol, asof - DayUs, DayUs),
      prevDailyBar =
        if (math.abs(symbol.hashCode) % 3 == 0) None
        else Some(barAt(symbol, asof - 2 * DayUs, DayUs)))
  }

  case class BookLevel(price: Double, size: Double)
  case class Orderbook(symbol: String, timeUs: Long,
      bids: Seq[BookLevel], asks: Seq[BookLevel])

  /** Latest orderbook at the snapshot asof: 5 bid / 5 ask levels on
    * the 0.25 grid around the crypto mid, sizes varying per level so
    * the imbalance is non-trivial. Symbols with hash % 3 == 0 carry a
    * 3-level ask side only at the top (thin-book shape); hash % 5 == 0
    * has NO bids at all (one-sided book around a halt — exercises the
    * absent-array path live). */
  def orderbook(symbol: String): Orderbook = {
    val t = SnapshotAsofUs
    val i = t / (120L * Micros)
    val mid = symBase(symbol) * 100.0 + (i % 64) * 0.25
    val h = math.abs(symbol.hashCode)
    val askDepth = if (h % 3 == 0) 3 else 5
    val bids =
      if (h % 5 == 0) Seq.empty
      else (1 to 5).map(k =>
        BookLevel(mid - 0.25 * k, 0.25 + 0.25 * ((k + h) % 8)))
    val asks = (1 to askDepth).map(k =>
      BookLevel(mid + 0.25 * k, 0.5 + 0.25 * ((k + 2 * h) % 6)))
    Orderbook(symbol, t, bids, asks)
  }

  case class OptionSnap(symbol: String, iv: Option[Double],
      delta: Option[Double], gamma: Double, theta: Double, vega: Double,
      rho: Double, bidPrice: Double, askPrice: Double,
      lastPrice: Option[Double], lastSize: Option[Long])

  /** Option snapshot per OCC symbol: every value a DYADIC rational
    * (k/16, k/32, k/64, k/128 — exactly representable doubles, so
    * sums and averages downstream stay exact) keyed off the strike
    * and right parsed from the OCC tail. Calls carry positive delta,
    * puts the call delta − 1 (put–call parity's delta relation) and
    * IV rises with |strike − 150| so each expiry shows a real smile.
    * Every 5th k has no latestTrade (untraded contract) and every 7th
    * no greeks/IV (brand-new listing) — the absent-section paths. */
  def optionSnapshot(occ: String): OptionSnap = {
    val right = occ.charAt(occ.length - 9)
    val strike1000 = occ.takeRight(8).toLong
    val strike = strike1000 / 1000
    val k = strike / 10 + (if (right == 'C') 0 else 7) +
      (math.abs(occ.hashCode) % 4)
    val newListing = k % 7 == 0
    val untraded = k % 5 == 0
    val smile = math.abs(strike - 150) / 10 // 0,1,2 for 140/150/160
    val iv = (16 + 4 * smile + (k % 8)) / 64.0
    val callDelta = ((k % 15) + 1) / 16.0
    val premium = 2.0 + (k % 16) * 0.25
    OptionSnap(occ,
      iv = if (newListing) None else Some(iv),
      delta = if (newListing) None
        else Some(if (right == 'C') callDelta else callDelta - 1.0),
      gamma = ((k % 10) + 1) / 128.0,
      theta = -(((k % 12) + 1) / 64.0),
      vega = ((k % 9) + 1) / 32.0,
      rho = (if (right == 'C') 1 else -1) * ((k % 6) + 1) / 64.0,
      bidPrice = premium - 0.25,
      askPrice = premium + 0.25,
      lastPrice = if (untraded) None else Some(premium),
      lastSize = if (untraded) None else Some(1L + k % 20))
  }

  case class CryptoSnapshot(symbol: String, latestTrade: CryptoTrade,
      latestQuote: CryptoQuote, minuteBar: Bar, dailyBar: Bar,
      prevDailyBar: Option[Bar])

  /** Crypto snapshot at the shared asof, derived from the same walks
    * the crypto row streams use; hash % 3 == 0 symbols have no
    * prevDailyBar. */
  def cryptoSnapshot(symbol: String): CryptoSnapshot = {
    val asof = SnapshotAsofUs
    CryptoSnapshot(symbol,
      latestTrade = cryptoTrades(symbol, asof - DayUs, asof).last,
      latestQuote = cryptoQuotes(symbol, asof - DayUs, asof).last,
      minuteBar = barAt(symbol, asof - MinuteUs, MinuteUs),
      dailyBar = barAt(symbol, asof - DayUs, DayUs),
      prevDailyBar =
        if (math.abs(symbol.hashCode) % 3 == 0) None
        else Some(barAt(symbol, asof - 2 * DayUs, DayUs)))
  }

  /** Deterministic screener boards (market-wide, no symbols
    * requested). Most-actives descend strictly by volume; movers
    * carry dyadic percent moves (k/8) with gainers positive and
    * losers negative, prices/changes on the 0.25 grid. */
  val ScreenerBoard: Seq[String] = Seq("TSLA", "AAPL", "NVDA", "AMD",
    "MSFT", "AMZN", "META", "GOOG", "NFLX", "INTC")

  case class ActiveRow(symbol: String, volume: Long, tradeCount: Long)
  case class MoverRow(symbol: String, percentChange: Double, change: Double,
      price: Double)

  def mostActives(top: Int): Seq[ActiveRow] =
    ScreenerBoard.zipWithIndex.map { case (s, i) =>
      ActiveRow(s, 10000000L - i * 750000L, 80000L - i * 5000L)
    }.take(top)

  def moverGainers(top: Int): Seq[MoverRow] =
    ScreenerBoard.take(5).zipWithIndex.map { case (s, i) =>
      MoverRow(s, (40 - i * 4) / 8.0, 2.0 - i * 0.25, symBase(s) + i * 0.25)
    }.take(top)

  def moverLosers(top: Int): Seq[MoverRow] =
    ScreenerBoard.drop(5).zipWithIndex.map { case (s, i) =>
      MoverRow(s, -((36 - i * 4) / 8.0), -(1.75 - i * 0.25), symBase(s) - i * 0.25)
    }.take(top)

  /** One corporate action per 5 days within [startUs, endUs); every
    * third has no payable_date and every fourth is a split. */
  def corpActions(symbol: String, startUs: Long, endUs: Long): Seq[CorpAction] = {
    val step = 5L * DayUs
    val first = ((startUs + step - 1) / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ < endUs).map { t =>
      val i = t / step
      val isSplit = i % 4 == 0
      CorpAction(symbol,
        exDateUs = Some(t),
        recordDateUs = Some(t + DayUs),
        payableDateUs = if (i % 3 == 0) None else Some(t + 3 * DayUs),
        tpe = if (isSplit) "split" else "dividend",
        amount = if (isSplit) 0.0 else 0.25 + (i % 8) * 0.25,
        ratio = if (isSplit) 2.0 + (i % 4) else 0.0,
        newSymbol = if (isSplit) symbol else "",
        oldSymbol = symbol)
    }.toSeq
  }
}

/**
 * In-process HTTP stub for the four Alpaca endpoints, backed by
 * AlpacaFixtures, with real pagination (`limit` + `page_token`) and a
 * fault path (`/stocks/bars` with symbol "FLAKY" fails twice with 503
 * then succeeds — exercises the retry loop). Single shared instance;
 * executors in local mode reach it over loopback.
 */
object AlpacaStubServer {
  import AlpacaFixtures._

  @volatile private var server: HttpServer = _
  @volatile private var port: Int = -1
  private val flakyHits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Total HTTP requests served — lets tests assert the request-grid
    * shrink from multi-symbol batching (and REFBENCH report request
    * counts) without packet capture. */
  private val requestCount = new java.util.concurrent.atomic.AtomicLong
  def requestsServed: Long = requestCount.get()

  /** Per-symbol request counts — lets tests prove NEGATIVE fetch
    * facts (a runtime-pruned symbol was never requested), which no
    * result-level assertion can. */
  private val symbolHits =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  def symbolRequests(sym: String): Long =
    Option(symbolHits.get(sym)).fold(0L)(_.longValue)

  def endpoint: String = synchronized {
    if (server == null) start()
    s"http://127.0.0.1:$port/v2"
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  private def q(params: Map[String, String], key: String): String =
    params.getOrElse(key, "")

  private def parseQuery(ex: HttpExchange): Map[String, String] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
    }.toMap
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def fmtD(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString + ".0" else d.toString

  /** Paginates per-symbol records and renders the envelope. Slices
    * BEFORE rendering so each page request pays O(limit) JSON work,
    * not O(interval) — with volume-aware multi-page partitions the old
    * render-then-slice shape re-rendered the whole interval per page
    * and dominated benchmark timings. Honors `sort=desc` (the real
    * API's server-side ordering, `stocks/trades.py:54-57`) by
    * reversing the naturally-ascending fixture records first.
    *
    * `symbolsParam` may be a comma-separated list (the real API's
    * multi-symbol request form): records stream symbol-major in
    * alphabetical order — the real combined-stream pagination — with
    * pages spanning symbol boundaries and the envelope carrying one
    * key per contiguous symbol run. */
  private def envelope[T](dataKey: String, symbolsParam: String,
      fetch: String => Seq[T], render: T => String, limit: Int,
      pageToken: String, sort: String = "asc"): String = {
    val syms = symbolsParam.split(',').map(_.trim).filter(_.nonEmpty).toSeq.sorted
    val combined: Seq[(String, T)] = syms.flatMap { s =>
      val rs = fetch(s)
      (if (sort == "desc") rs.reverse else rs).map(s -> _)
    }
    val offset = if (pageToken.isEmpty) 0 else pageToken.toInt
    val page = combined.slice(offset, offset + limit)
    val nextTok =
      if (offset + limit < combined.size) jsonStr((offset + limit).toString)
      else "null"
    if (page.isEmpty) s"""{"$dataKey": {}, "next_page_token": null}"""
    else {
      val sb = new StringBuilder(s"""{"$dataKey": {""")
      var cur: String = null
      page.foreach { case (s, r) =>
        if (s != cur) {
          if (cur != null) sb.append("], ")
          sb.append(jsonStr(s)).append(": [")
          cur = s
        } else sb.append(",")
        sb.append(render(r))
      }
      sb.append(s"""]}, "next_page_token": $nextTok}""")
      sb.toString
    }
  }

  private def handle(ex: HttpExchange, render: Map[String, String] => (Int, String)): Unit = {
    requestCount.incrementAndGet()
    parseQuery(ex).getOrElse("symbols", "").split(",").filter(_.nonEmpty)
      .foreach(s => symbolHits.merge(s, 1L, (a, b) => a + b))
    val (code, body) = render(parseQuery(ex))
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    // RATELIMIT fixtures advertise the server's own backoff: numeric
    // for the honored path, garbage for the fallback path
    if (code == 429) {
      val sym = parseQuery(ex).getOrElse("symbols", "")
      ex.getResponseHeaders.set("Retry-After",
        if (sym == "RATELIMITBAD") "soon" else "0")
    }
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def isoToUs(s: String): Long =
    AlpacaOptions.parseIsoMicros(s).getOrElse(0L)

  private def barJson(b: Bar): String =
    s"""{"t": ${jsonStr(AlpacaOptions.microsToIso(b.timeUs))}, "o": ${fmtD(b.open)}, "h": ${fmtD(b.high)}, "l": ${fmtD(b.low)}, "c": ${fmtD(b.close)}, "v": ${b.volume}, "n": ${b.tradeCount}, "vw": ${fmtD(b.vwap)}}"""

  private def tradeJson(t: Trade): String =
    s"""{"t": ${jsonStr(AlpacaOptions.microsToIso(t.timeUs))}, "x": ${jsonStr(t.exchange)}, "p": ${fmtD(t.price)}, "s": ${t.size}, "c": [${t.conditions.map(jsonStr).mkString(",")}], "i": ${t.id}, "z": ${jsonStr(t.tape)}}"""

  private def cryptoTradeJson(t: CryptoTrade): String =
    s"""{"t": ${jsonStr(AlpacaOptions.microsToIso(t.timeUs))}, "p": ${fmtD(t.price)}, "s": ${fmtD(t.size)}, "i": ${t.id}, "tks": ${jsonStr(t.takerSide)}}"""

  private def stockQuoteJson(qt: StockQuote): String =
    s"""{"t": ${jsonStr(AlpacaOptions.microsToIso(qt.timeUs))}, "ax": ${jsonStr(qt.askExchange)}, "ap": ${fmtD(qt.askPrice)}, "as": ${qt.askSize}, "bx": ${jsonStr(qt.bidExchange)}, "bp": ${fmtD(qt.bidPrice)}, "bs": ${qt.bidSize}, "c": [${qt.conditions.map(jsonStr).mkString(",")}], "z": ${jsonStr(qt.tape)}}"""

  private def cryptoQuoteJson(qt: CryptoQuote): String =
    s"""{"t": ${jsonStr(AlpacaOptions.microsToIso(qt.timeUs))}, "bp": ${fmtD(qt.bidPrice)}, "bs": ${fmtD(qt.bidSize)}, "ap": ${fmtD(qt.askPrice)}, "as": ${fmtD(qt.askSize)}}"""

  // empty condition omits the `c` key entirely (the API's optional
  // scalar), so the parsers' absent-key default path is exercised live
  private def optionTradeJson(t: OptionTrade): String = {
    val cond = if (t.condition.isEmpty) "" else s""", "c": ${jsonStr(t.condition)}"""
    s"""{"t": ${jsonStr(AlpacaOptions.microsToIso(t.timeUs))}, "x": ${jsonStr(t.exchange)}, "p": ${fmtD(t.price)}, "s": ${t.size}$cond}"""
  }

  private def optionQuoteJson(qt: OptionQuote): String = {
    val cond = if (qt.condition.isEmpty) "" else s""", "c": ${jsonStr(qt.condition)}"""
    s"""{"t": ${jsonStr(AlpacaOptions.microsToIso(qt.timeUs))}, "ax": ${jsonStr(qt.askExchange)}, "ap": ${fmtD(qt.askPrice)}, "as": ${qt.askSize}, "bx": ${jsonStr(qt.bidExchange)}, "bp": ${fmtD(qt.bidPrice)}, "bs": ${qt.bidSize}$cond}"""
  }

  private def auctionPrintJson(p: AuctionPrint): String = {
    val cond = if (p.condition.isEmpty) "" else s""", "c": ${jsonStr(p.condition)}"""
    s"""{"t": ${jsonStr(AlpacaOptions.microsToIso(p.timeUs))}, "x": ${jsonStr(p.exchange)}, "p": ${fmtD(p.price)}, "s": ${p.size}$cond}"""
  }

  /** Daily auction record: `d` (calendar date) + `o` print array;
    * the `c` key is omitted entirely on days with no closing auction
    * (the API's half-day shape — exercises the parser's
    * absent-array default). */
  private def auctionDayJson(a: AuctionDay): String = {
    val d = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(a.dateUs / 1000000L))
    val closes =
      if (a.closes.isEmpty) ""
      else s""", "c": [${a.closes.map(auctionPrintJson).mkString(",")}]"""
    s"""{"d": ${jsonStr(d)}, "o": [${a.opens.map(auctionPrintJson).mkString(",")}]$closes}"""
  }

  private def caJson(c: CorpAction): String = {
    val ex = c.exDateUs.map(u => jsonStr(AlpacaOptions.microsToIso(u))).getOrElse("null")
    val rd = c.recordDateUs.map(u => jsonStr(AlpacaOptions.microsToIso(u))).getOrElse("null")
    val pd = c.payableDateUs.map(u => jsonStr(AlpacaOptions.microsToIso(u))).getOrElse("null")
    s"""{"ex_date": $ex, "record_date": $rd, "payable_date": $pd, "type": ${jsonStr(c.tpe)}, "amount": ${fmtD(c.amount)}, "ratio": ${fmtD(c.ratio)}, "new_symbol": ${jsonStr(c.newSymbol)}, "old_symbol": ${jsonStr(c.oldSymbol)}}"""
  }

  private def newsJson(a: NewsArticle): String = {
    val upd = a.updatedUs
      .map(u => s""""updated_at": ${jsonStr(AlpacaOptions.microsToIso(u))}, """)
      .getOrElse("")
    s"""{"id": ${a.id}, "headline": ${jsonStr(a.headline)}, """ +
      s""""author": ${jsonStr(a.author)}, """ +
      s""""created_at": ${jsonStr(AlpacaOptions.microsToIso(a.timeUs))}, $upd""" +
      s""""summary": ${jsonStr(a.summary)}, "content": ${jsonStr(a.content)}, """ +
      s""""symbols": [${a.symbols.map(jsonStr).mkString(",")}], """ +
      s""""source": ${jsonStr(a.source)}, "url": ${jsonStr(a.url)}}"""
  }

  /** Flat-array envelope (`{"news": [...]}`): the one un-keyed page
    * shape in the API. Multi-symbol requests dedup by id exactly like
    * the real endpoint (a cross-listed article appears once per
    * RESPONSE, not per symbol). */
  private def newsHandler(params: Map[String, String]): (Int, String) = {
    val syms = q(params, "symbols").split(',').map(_.trim).filter(_.nonEmpty)
      .toSeq.sorted
    val startUs = isoToUs(q(params, "start"))
    val endUs = isoToUs(q(params, "end"))
    val limit = params.get("limit").map(_.toInt).getOrElse(10000)
    val sort = params.getOrElse("sort", "asc")
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val base = syms.flatMap(newsArticles(_, startUs, endUs))
      .filter(a => seen.add(a.id))
      .sortBy(a => (a.timeUs, a.id))
    val all = if (sort == "desc") base.reverse else base
    val tok = q(params, "page_token")
    val offset = if (tok.isEmpty) 0 else tok.toInt
    val page = all.slice(offset, offset + limit)
    val nextTok =
      if (offset + limit < all.size) jsonStr((offset + limit).toString)
      else "null"
    (200,
      s"""{"news": [${page.map(newsJson).mkString(",")}], "next_page_token": $nextTok}""")
  }

  private def barsHandler(params: Map[String, String]): (Int, String) = {
    val symbol = q(params, "symbols")
    if (symbol == "FLAKY") {
      val hits = flakyHits.merge(q(params, "start"), 1, (a, b) => a + b)
      if (hits <= 2) return (503, """{"message": "service unavailable"}""")
    }
    // RATELIMIT / RATELIMITBAD: 429 twice with a Retry-After header
    // (numeric / garbage — set in handle()), then success
    if (symbol.startsWith("RATELIMIT")) {
      val hits = flakyHits.merge(symbol + q(params, "start"), 1, (a, b) => a + b)
      if (hits <= 2) return (429, """{"message": "rate limit exceeded"}""")
    }
    val tfUs = Timeframe.parseMicros(params.getOrElse("timeframe", "1Hour"))
    val limit = params.get("limit").map(_.toInt).getOrElse(10000)
    val tok = q(params, "page_token")
    val sort = params.getOrElse("sort", "asc")
    // ------------------------- hostile-input fixtures (ConnectorSpec)
    // Each models a distinct server failure the connector must handle
    // deliberately: only RECORD-level damage (MALFORMED) is skippable;
    // structural page damage must fail the task.
    if (symbol == "TRUNCATED") {
      // valid envelope cut mid-record: stream parse must fail the page
      val bs = bars(symbol, isoToUs(q(params, "start")), isoToUs(q(params, "end")), tfUs)
        .map(barJson)
      val full =
        s"""{"bars": {${jsonStr(symbol)}: [${bs.mkString(",")}]}, "next_page_token": null}"""
      return (200, full.substring(0, full.length - full.length / 3))
    }
    if (symbol == "EMPTYBODY") return (200, "")
    if (symbol == "TOKENLOOP") {
      // always the same page with the same non-null token — a paging
      // bug that would loop forever without the client's cycle guard
      val one = barJson(barAt(symbol, gridFirst(isoToUs(q(params, "start")), tfUs), tfUs))
      return (200,
        s"""{"bars": {${jsonStr(symbol)}: [$one]}, "next_page_token": "0"}""")
    }
    if (symbol == "DUPPAGE") {
      // transient-fault model: the server re-serves the SAME records on
      // the second page of the chain (a retry/proxy bug re-emitting a
      // page). Without the scan-integrity ordering invariant the dup
      // rows flow silently into downstream aggregates; with it the
      // first repeated instant regresses against the previous page's
      // last and the task fails loudly.
      val bs = bars(symbol, isoToUs(q(params, "start")), isoToUs(q(params, "end")), tfUs)
        .map(barJson)
      val nextTok = if (tok.isEmpty) "\"again\"" else "null"
      return (200,
        s"""{"bars": {${jsonStr(symbol)}: [${bs.mkString(",")}]}, "next_page_token": $nextTok}""")
    }
    if (symbol == "BACKWARDS") {
      // ordered-delivery violation: records arrive time-DESCENDING on
      // an asc request (server-side ordering bug / wrong shard merge)
      val bs = bars(symbol, isoToUs(q(params, "start")), isoToUs(q(params, "end")), tfUs)
        .reverse.map(barJson)
      return (200,
        s"""{"bars": {${jsonStr(symbol)}: [${bs.mkString(",")}]}, "next_page_token": null}""")
    }
    if (symbol == "DRIFTEXTRA") {
      // mid-stream schema drift, additive direction: from the second
      // page on, every record carries unknown keys (scalar, nested
      // object, array). The real API adds fields without versioning;
      // the reference tolerates them (dict access ignores extras,
      // bars.py:199-225) and graft's token walk must skipChildren()
      // past them — same rows as a clean symbol, no skips, no errors.
      val startUs = isoToUs(q(params, "start"))
      val endUs = isoToUs(q(params, "end"))
      val first = gridFirst(startUs, tfUs)
      val total = gridCount(startUs, endUs, tfUs)
      val offset = if (tok.isEmpty) 0 else tok.toInt
      val hi = math.min(offset + limit, total)
      val page = (offset until hi).map { k =>
        val b = barJson(barAt(symbol, first + k.toLong * tfUs, tfUs))
        if (offset == 0) b
        else b.dropRight(1) +
          """, "zz_new_metric": 7.5, "meta": {"src": "v3", "tags": [1, 2]}, "flags": ["a", "b"]}"""
      }
      val nextTok = if (hi < total) jsonStr(hi.toString) else "null"
      val body =
        if (page.isEmpty) """{"bars": {}, "next_page_token": null}"""
        else s"""{"bars": {${jsonStr(symbol)}: [${page.mkString(",")}]}, "next_page_token": $nextTok}"""
      return (200, body)
    }
    if (symbol == "MALFORMED")
      // first record lacks h/l/c/v/n/vw → parser must warn + skip it.
      // Tiny fixture range, so pre-rendering the full list here is fine.
      (200, envelope("bars", symbol,
        _ => s"""{"t": ${jsonStr(AlpacaOptions.microsToIso(isoToUs(q(params, "start"))))}, "o": 1.0}""" +:
          bars(symbol, isoToUs(q(params, "start")), isoToUs(q(params, "end")), tfUs).map(barJson),
        identity[String], limit, tok, sort))
    else {
      // O(page) paging on the time grid: volume-aware partitions span
      // weeks of minute bars (≈50k records over 5 pages), and
      // materializing the whole interval per page request made the
      // stub — not the engine under test — the benchmark bottleneck.
      // Multi-symbol requests stream symbol-major (alphabetical) with
      // the page token spanning symbol boundaries, like the real API's
      // combined stream — all still O(page), never O(symbols×interval).
      val syms = symbol.split(',').map(_.trim).filter(_.nonEmpty).toSeq.sorted
      val startUs = isoToUs(q(params, "start"))
      val endUs = isoToUs(q(params, "end"))
      val first = gridFirst(startUs, tfUs)
      val total = gridCount(startUs, endUs, tfUs).toLong // per symbol
      val combinedTotal = total * syms.length
      val offset = if (tok.isEmpty) 0L else tok.toLong
      val hi = math.min(offset + limit, combinedTotal)
      val nextTok = if (hi < combinedTotal) jsonStr(hi.toString) else "null"
      val body =
        if (hi <= offset) """{"bars": {}, "next_page_token": null}"""
        else {
          val sb = new StringBuilder("""{"bars": {""")
          var cur: String = null
          (offset until hi).foreach { k =>
            val sym = syms((k / total).toInt)
            val inIdx = k % total
            val idx = if (sort == "desc") total - 1 - inIdx else inIdx
            if (sym != cur) {
              if (cur != null) sb.append("], ")
              sb.append(jsonStr(sym)).append(": [")
              cur = sym
            } else sb.append(",")
            sb.append(barJson(barAt(sym, first + idx * tfUs, tfUs)))
          }
          sb.append(s"""]}, "next_page_token": $nextTok}""")
          sb.toString
        }
      (200, body)
    }
  }

  private def start(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v2/stocks/bars",
      (ex: HttpExchange) => handle(ex, barsHandler))
    server.createContext("/v2/options/bars",
      (ex: HttpExchange) => handle(ex, barsHandler))
    server.createContext("/v1beta3/crypto/us/bars",
      (ex: HttpExchange) => handle(ex, barsHandler))
    server.createContext("/v2/stocks/trades", (ex: HttpExchange) => handle(ex, { params =>
      val symbol = q(params, "symbols")
      // OVERLIMIT ignores the requested page size entirely: every
      // record in the interval arrives in ONE page (>10× `limit`).
      // The reader must size to what arrives, not to what it asked
      // for — per-page memory is bounded by the response body it
      // already holds either way.
      val limit =
        if (symbol == "OVERLIMIT") Int.MaxValue
        else params.get("limit").map(_.toInt).getOrElse(10000)
      // DRIFTMISSING: mid-stream schema drift, subtractive direction —
      // from the second page on, records OMIT the optional `c`
      // (conditions) key. The reference's parser defaults it
      // (trades.py .get path); graft must emit conditions = "" for
      // those rows and parse everything else unchanged — optional-key
      // drift is record-shape tolerance, NOT malformed-record damage.
      val renderTrade: Trade => String =
        if (symbol == "DRIFTMISSING") {
          val offset = {
            val tok = q(params, "page_token")
            if (tok.isEmpty) 0 else tok.toInt
          }
          t => {
            val j = tradeJson(t)
            if (offset == 0) j
            else j.replaceFirst(""", "c": \[[^\]]*\]""", "")
          }
        } else tradeJson
      (200, envelope("trades", symbol,
        s => trades(s, isoToUs(q(params, "start")), isoToUs(q(params, "end"))),
        renderTrade, limit,
        q(params, "page_token"), params.getOrElse("sort", "asc")))
    }))
    server.createContext("/v1beta3/crypto/us/trades", (ex: HttpExchange) => handle(ex, { params =>
      val symbol = q(params, "symbols")
      (200, envelope("trades", symbol,
        s => cryptoTrades(s, isoToUs(q(params, "start")), isoToUs(q(params, "end"))),
        cryptoTradeJson, params.get("limit").map(_.toInt).getOrElse(10000),
        q(params, "page_token"), params.getOrElse("sort", "asc")))
    }))
    server.createContext("/v2/stocks/quotes", (ex: HttpExchange) => handle(ex, { params =>
      val symbol = q(params, "symbols")
      // "MV…" symbols get the multi-venue fixture (same instant, three
      // venues) — the consolidated-tape input for the NBBO gate
      (200, envelope("quotes", symbol,
        s => if (s.startsWith("MV"))
          stockQuotesMulti(s, isoToUs(q(params, "start")), isoToUs(q(params, "end")))
        else stockQuotes(s, isoToUs(q(params, "start")), isoToUs(q(params, "end"))),
        stockQuoteJson, params.get("limit").map(_.toInt).getOrElse(10000),
        q(params, "page_token"), params.getOrElse("sort", "asc")))
    }))
    server.createContext("/v1beta3/crypto/us/quotes", (ex: HttpExchange) => handle(ex, { params =>
      val symbol = q(params, "symbols")
      (200, envelope("quotes", symbol,
        s => cryptoQuotes(s, isoToUs(q(params, "start")), isoToUs(q(params, "end"))),
        cryptoQuoteJson, params.get("limit").map(_.toInt).getOrElse(10000),
        q(params, "page_token"), params.getOrElse("sort", "asc")))
    }))
    server.createContext("/v2/options/trades", (ex: HttpExchange) => handle(ex, { params =>
      val symbol = q(params, "symbols")
      (200, envelope("trades", symbol,
        s => optionTrades(s, isoToUs(q(params, "start")), isoToUs(q(params, "end"))),
        optionTradeJson, params.get("limit").map(_.toInt).getOrElse(10000),
        q(params, "page_token"), params.getOrElse("sort", "asc")))
    }))
    server.createContext("/v2/options/quotes", (ex: HttpExchange) => handle(ex, { params =>
      val symbol = q(params, "symbols")
      (200, envelope("quotes", symbol,
        s => optionQuotes(s, isoToUs(q(params, "start")), isoToUs(q(params, "end"))),
        optionQuoteJson, params.get("limit").map(_.toInt).getOrElse(10000),
        q(params, "page_token"), params.getOrElse("sort", "asc")))
    }))
    server.createContext("/v1beta1/news",
      (ex: HttpExchange) => handle(ex, newsHandler))
    // latest-record family: keyed envelope, per-symbol value is ONE
    // object record (same record shapes as the row streams, derived
    // from the same fixtures at the snapshot asof)
    def latestHandler(dataKey: String, render: String => String): HttpHandler =
      (ex: HttpExchange) => handle(ex, { params =>
        val syms = q(params, "symbols").split(',').map(_.trim).filter(_.nonEmpty)
          .toSeq.sorted
        val body = syms.map(s => s"${jsonStr(s)}: ${render(s)}").mkString(",")
        (200, s"""{"$dataKey": {$body}}""")
      })
    server.createContext("/v2/stocks/trades/latest",
      latestHandler("trades", s => tradeJson(snapshot(s).latestTrade)))
    server.createContext("/v2/stocks/quotes/latest",
      latestHandler("quotes", s => stockQuoteJson(snapshot(s).latestQuote)))
    server.createContext("/v2/stocks/bars/latest",
      latestHandler("bars", s => barJson(snapshot(s).minuteBar)))
    // screeners: market-wide (no symbols param); the movers body
    // carries BOTH arrays — each Spark source selects its dataKey
    server.createContext("/v1beta1/screener/stocks/most-actives",
      (ex: HttpExchange) => handle(ex, { params =>
        val top = params.get("top").map(_.toInt).getOrElse(10)
        val rows = mostActives(top).map(a =>
          s"""{"symbol": ${jsonStr(a.symbol)}, "volume": ${a.volume}, "trade_count": ${a.tradeCount}}""")
        (200, s"""{"most_actives": [${rows.mkString(",")}], "last_updated": "2021-01-05T00:00:00Z"}""")
      }))
    server.createContext("/v1beta1/screener/stocks/movers",
      (ex: HttpExchange) => handle(ex, { params =>
        val top = params.get("top").map(_.toInt).getOrElse(10)
        def mj(m: MoverRow) =
          s"""{"symbol": ${jsonStr(m.symbol)}, "percent_change": ${fmtD(m.percentChange)}, "change": ${fmtD(m.change)}, "price": ${fmtD(m.price)}}"""
        (200,
          s"""{"gainers": [${moverGainers(top).map(mj).mkString(",")}], """ +
            s""""losers": [${moverLosers(top).map(mj).mkString(",")}], """ +
            s""""market_type": "stocks", "last_updated": "2021-01-05T00:00:00Z"}""")
      }))
    // option snapshots: keyed object records with IV + nested greeks;
    // new listings omit greeks/impliedVolatility, untraded contracts
    // omit latestTrade
    server.createContext("/v1beta1/options/snapshots",
      (ex: HttpExchange) => handle(ex, { params =>
        val syms = q(params, "symbols").split(',').map(_.trim).filter(_.nonEmpty)
          .toSeq.sorted
        val body = syms.map { s =>
          val o = optionSnapshot(s)
          val greeks = o.delta.map(d =>
            s""""greeks": {"delta": ${fmtD(d)}, "gamma": ${fmtD(o.gamma)}, """ +
              s""""theta": ${fmtD(o.theta)}, "vega": ${fmtD(o.vega)}, """ +
              s""""rho": ${fmtD(o.rho)}}, """).getOrElse("")
          val iv = o.iv.map(v => s""""impliedVolatility": ${fmtD(v)}, """).getOrElse("")
          val lt = o.lastPrice.map(p =>
            s""", "latestTrade": {"p": ${fmtD(p)}, "s": ${o.lastSize.get}}""").getOrElse("")
          s"""${jsonStr(s)}: {$greeks$iv"latestQuote": {"bp": ${fmtD(o.bidPrice)}, "ap": ${fmtD(o.askPrice)}}$lt}"""
        }.mkString(",")
        (200, s"""{"snapshots": {$body}}""")
      }))
    // crypto latest family + snapshots (v1beta3): keyed object
    // records; the crypto snapshot envelope is KEYED, unlike the
    // bare stock one
    server.createContext("/v1beta3/crypto/us/latest/trades",
      latestHandler("trades", s => cryptoTradeJson(cryptoSnapshot(s).latestTrade)))
    server.createContext("/v1beta3/crypto/us/latest/quotes",
      latestHandler("quotes", s => cryptoQuoteJson(cryptoSnapshot(s).latestQuote)))
    server.createContext("/v1beta3/crypto/us/latest/bars",
      latestHandler("bars", s => barJson(cryptoSnapshot(s).minuteBar)))
    server.createContext("/v1beta3/crypto/us/snapshots",
      latestHandler("snapshots", { s =>
        val sn = cryptoSnapshot(s)
        val prev = sn.prevDailyBar
          .map(b => s""", "prevDailyBar": ${barJson(b)}""").getOrElse("")
        s"""{"latestTrade": ${cryptoTradeJson(sn.latestTrade)}, """ +
          s""""latestQuote": ${cryptoQuoteJson(sn.latestQuote)}, """ +
          s""""minuteBar": ${barJson(sn.minuteBar)}, """ +
          s""""dailyBar": ${barJson(sn.dailyBar)}$prev}"""
      }))
    // latest orderbooks: keyed envelope whose per-symbol value is an
    // OBJECT with nested depth-level arrays; no pagination
    server.createContext("/v1beta3/crypto/us/latest/orderbooks",
      (ex: HttpExchange) => handle(ex, { params =>
        val syms = q(params, "symbols").split(',').map(_.trim).filter(_.nonEmpty)
          .toSeq.sorted
        def lvl(l: BookLevel) = s"""{"p": ${fmtD(l.price)}, "s": ${fmtD(l.size)}}"""
        val body = syms.map { s =>
          val ob = orderbook(s)
          // empty bid side omits the `b` key (the one-sided shape)
          val b =
            if (ob.bids.isEmpty) ""
            else s""""b": [${ob.bids.map(lvl).mkString(",")}], """
          s"""${jsonStr(s)}: {"t": ${jsonStr(AlpacaOptions.microsToIso(ob.timeUs))}, """ +
            s"""$b"a": [${ob.asks.map(lvl).mkString(",")}]}"""
        }.mkString(",")
        (200, s"""{"orderbooks": {$body}}""")
      }))
    // snapshots: BARE symbol-keyed envelope — symbols are the
    // TOP-LEVEL fields (the real multi-symbol response shape), each
    // mapping to one nested object record; no pagination
    server.createContext("/v2/stocks/snapshots", (ex: HttpExchange) => handle(ex, { params =>
      val syms = q(params, "symbols").split(',').map(_.trim).filter(_.nonEmpty)
        .toSeq.sorted
      val body = syms.map { s =>
        val sn = snapshot(s)
        val prev = sn.prevDailyBar
          .map(b => s""", "prevDailyBar": ${barJson(b)}""").getOrElse("")
        s"""${jsonStr(s)}: {"latestTrade": ${tradeJson(sn.latestTrade)}, """ +
          s""""latestQuote": ${stockQuoteJson(sn.latestQuote)}, """ +
          s""""minuteBar": ${barJson(sn.minuteBar)}, """ +
          s""""dailyBar": ${barJson(sn.dailyBar)}$prev}"""
      }.mkString(",")
      (200, s"{$body}")
    }))
    // meta dimension endpoints: BARE-object bodies (no envelope key,
    // no pagination) — codes match the trade/quote fixture cycles so
    // enrichment joins decode every fixture row
    server.createContext("/v2/stocks/meta/exchanges",
      (ex: HttpExchange) => handle(ex, { _ =>
        (200, """{"N": "New York Stock Exchange", "Q": "NASDAQ", "V": "IEX"}""")
      }))
    server.createContext("/v2/stocks/meta/conditions/trade",
      (ex: HttpExchange) => handle(ex, { params =>
        val base =
          """"@": "Regular Sale", "F": "Intermarket Sweep", "I": "Odd Lot Trade", "T": "Extended Hours Trade""""
        // tape B has one extra venue-specific code — proves the tape
        // param actually reaches the request
        val body = params.getOrElse("tape", "A") match {
          case "B" => s"""{$base, "W": "Average Price Trade"}"""
          case _ => s"""{$base}"""
        }
        (200, body)
      }))
    server.createContext("/v2/stocks/meta/conditions/quote",
      (ex: HttpExchange) => handle(ex, { _ =>
        (200, """{"O": "Opening Quote", "R": "Regular"}""")
      }))
    server.createContext("/v2/stocks/auctions", (ex: HttpExchange) => handle(ex, { params =>
      val symbol = q(params, "symbols")
      // MALFORMED: the FIRST daily record's second print lacks its
      // price — the fan-out parser must drop that whole day atomically
      // (no half-day of prints) and keep every later record
      val render: AuctionDay => String =
        if (symbol == "MALFORMED") {
          var first = true
          a => {
            val j = auctionDayJson(a)
            if (first && a.opens.nonEmpty) {
              first = false
              val extra = """{"t": "2021-01-04T15:30:00Z", "x": "N", "s": 1}"""
              j.replaceFirst("""\"o\": \[""", s""""o": [$extra, """)
            } else j
          }
        } else auctionDayJson
      // pagination counts DAILY records (the API's unit), not prints
      (200, envelope("auctions", symbol,
        s => auctionDays(s, isoToUs(q(params, "start")), isoToUs(q(params, "end"))),
        render, params.get("limit").map(_.toInt).getOrElse(10000),
        q(params, "page_token"), params.getOrElse("sort", "asc")))
    }))
    server.createContext("/v2/stocks/corporate_actions", (ex: HttpExchange) => handle(ex, { params =>
      val symbol = q(params, "symbols")
      (200, envelope("corporate_actions", symbol,
        s => corpActions(s, isoToUs(q(params, "start")), isoToUs(q(params, "end"))),
        caJson, params.get("limit").map(_.toInt).getOrElse(10000),
        q(params, "page_token")))
    }))
    // Daemon threads: the stub must never keep the JVM alive after
    // main() returns (Verify/Bench exit cleanly without stop()).
    // 32 threads: local[32] runs 32 concurrent fetching tasks; an
    // 8-thread pool made them queue 4-deep at the stub and charged
    // the wait to whichever engine was being measured.
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32,
      (r: Runnable) => {
        val t = new Thread(r, "alpaca-stub")
        t.setDaemon(true)
        t
      }))
    server.start()
    port = server.getAddress.getPort
  }
}
