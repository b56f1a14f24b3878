package graft.tools

import graft.core.{AlpacaHttpClient, BarParser}

/** Diagnostic: times HTTP fetch vs JSON parse for one volume-aware
  * bars partition (5 pages × 10k minute bars) against a stub endpoint.
  * Usage: runMain graft.tools.FetchProbe <endpoint-with-/v2> [threads] */
object FetchProbe {
  def main(args: Array[String]): Unit = {
    val endpoint = args.headOption.getOrElse(graft.stub.AlpacaStubServer.endpoint)
    val threads = if (args.length > 1) args(1).toInt else 1
    val base = endpoint.stripSuffix("/v2").stripSuffix("/")

    def onePartition(sym: String, tag: String): Unit = {
      val client = new AlpacaHttpClient(base,
        Map("APCA-API-KEY-ID" -> "k", "APCA-API-SECRET-KEY" -> "s"),
        Seq("v2", "stocks", "bars"))
      val params = Seq(
        "symbols" -> sym,
        "start" -> "2021-01-01T00:00:00.000000+00:00",
        "end" -> "2021-02-04T16:00:00.000000+00:00",
        "timeframe" -> "1Min",
        "limit" -> "10000")
      var tok: Option[String] = None
      var page = 0
      var total = 0
      while (page == 0 || tok.isDefined) {
        val t0 = System.nanoTime()
        val pg = client.getPage(params, tok)
        val t1 = System.nanoTime()
        val data = pg.get("bars")
        var n = 0
        if (data != null && data.isObject) {
          val fields = data.properties().iterator()
          while (fields.hasNext) {
            val e = fields.next()
            val it = e.getValue.elements()
            while (it.hasNext) { BarParser.parse(e.getKey, it.next()); n += 1 }
          }
        }
        val t2 = System.nanoTime()
        total += n
        println(f"$tag page $page%d: fetch+readTree ${(t1 - t0) / 1e6}%.1f ms, parse($n) ${(t2 - t1) / 1e6}%.1f ms")
        tok = Option(pg.get("next_page_token")).filter(!_.isNull).map(_.asText()).filter(_.nonEmpty)
        page += 1
      }
      println(s"$tag total records: $total")
    }

    // warm
    onePartition("WARM", "warm")
    if (threads <= 1) onePartition("AAPL", "probe")
    else {
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { i =>
        val t = new Thread(() => onePartition(s"SYM$i", s"t$i"))
        t.start(); t
      }
      ts.foreach(_.join())
      println(f"concurrent($threads) wall: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
