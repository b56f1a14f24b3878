package graft.core

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.slf4j.LoggerFactory

/** Pure, Spark-free HTTP/pagination core (the testable seam of
  * SURVEY §3.3). JDK-only: `java.net.http.HttpClient` + the Jackson
  * that ships with Spark.
  *
  * Mirrors the reference's fetch pipeline semantics:
  *  - URL building with encoded params, None values skipped
  *    (`common.py:62-87`)
  *  - connect timeout 10 s / read timeout 30 s (`common.py:126`)
  *  - retry on HTTP 429/500/502/503/504 with exponential backoff
  *    0.5s/1s/2s, GET only (`common.py:139-163`)
  *  - pagination over `next_page_token` (`common.py:166-205`)
  *  - optional inter-page rate-limit sleep (`common.py:203-205`)
  */
class AlpacaHttpClient(
    endpoint: String,
    headers: Map[String, String],
    pathElements: Seq[String],
    maxRetries: Int = AlpacaHttpClient.MaxRetries) {

  private val log = LoggerFactory.getLogger(getClass)
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()
  private val mapper = new ObjectMapper()

  def buildUrl(params: Seq[(String, String)]): String = {
    val path = pathElements.mkString("/")
    val qs = params.collect { case (k, v) if v != null =>
      s"$k=${URLEncoder.encode(v, StandardCharsets.UTF_8).replace("+", "%20")}"
    }.mkString("&")
    s"$endpoint/$path?$qs"
  }

  /** Fetches one page; retries retryable statuses with backoff, fails
    * the (Spark) task on anything else — task retry covers the rest. */
  def getPage(params: Seq[(String, String)], pageToken: Option[String]): JsonNode = {
    val url = buildUrl(params ++ pageToken.map("page_token" -> _))
    var attempt = 0
    while (true) {
      val builder = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(30))
        .GET()
      headers.foreach { case (k, v) => builder.header(k, v) }
      val response =
        try client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
        catch {
          case e: java.io.IOException =>
            throw new RuntimeException(s"Network request failed: ${e.getMessage}", e)
        }
      val code = response.statusCode()
      if (code >= 200 && code < 300) {
        return mapper.readTree(response.body())
      } else if (AlpacaHttpClient.RetryStatuses.contains(code) && attempt < maxRetries) {
        val backoffMs = (500L << attempt) // 0.5s, 1s, 2s
        log.warn(s"HTTP $code for $url; retry ${attempt + 1}/$maxRetries in ${backoffMs}ms")
        Thread.sleep(backoffMs)
        attempt += 1
      } else {
        throw new RuntimeException(
          s"HTTP error $code for $url: ${response.body().take(500)}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def pageToken(pg: JsonNode): Option[String] =
    Option(pg.get("next_page_token"))
      .filter(n => !n.isNull)
      .map(_.asText())
      .filter(_.nonEmpty)

  /** Lazy page iterator: yields each page's JSON while a
    * `next_page_token` is present.
    *
    * With no rate-limit delay, the NEXT page's HTTP request is issued
    * asynchronously as soon as the current page's JSON arrives, so
    * network/server time overlaps the consumer's parse time (the
    * multi-page chain is each partition's critical path; the reference
    * fetches strictly sequentially, `common.py:166-205`). One page of
    * lookahead bounds buffered memory at a single response body. When
    * `rateLimitDelaySec` is configured, pagination stays strictly
    * sequential so the inter-page sleep keeps its meaning (H5). */
  def fetchAllPages(
      params: Seq[(String, String)],
      rateLimitDelaySec: Double = 0.0): Iterator[JsonNode] =
    if (rateLimitDelaySec > 0)
      new Iterator[JsonNode] {
        private var numPages = 0
        private var nextToken: Option[String] = None
        override def hasNext: Boolean = numPages < 1 || nextToken.isDefined
        override def next(): JsonNode = {
          if (numPages > 0)
            Thread.sleep((rateLimitDelaySec * 1000).toLong)
          val pg = getPage(params, nextToken)
          numPages += 1
          nextToken = pageToken(pg)
          pg
        }
      }
    else
      new Iterator[JsonNode] {
        private var inFlight: java.util.concurrent.CompletableFuture[JsonNode] = _
        private var done = false
        private def submit(tok: Option[String]): Unit =
          inFlight = java.util.concurrent.CompletableFuture.supplyAsync(
            () => getPage(params, tok), AlpacaHttpClient.prefetchPool)
        override def hasNext: Boolean = !done
        override def next(): JsonNode = {
          if (inFlight == null) submit(None)
          val pg =
            try inFlight.join()
            catch {
              case e: java.util.concurrent.CompletionException =>
                throw Option(e.getCause).getOrElse(e)
            }
          pageToken(pg) match {
            case some @ Some(_) => submit(some)
            case None => done = true
          }
          pg
        }
      }
}

object AlpacaHttpClient {
  /** reference: `common.py:25,151-156` */
  val MaxRetries = 3
  val RetryStatuses: Set[Int] = Set(429, 500, 502, 503, 504)

  /** Shared daemon pool for one-page-ahead prefetch. Cached: grows to
    * the number of concurrently-fetching partitions on this executor
    * (each holds at most one in-flight request) and idle threads die
    * after 60 s, so it never pins the JVM or leaks across queries. */
  private[core] lazy val prefetchPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newCachedThreadPool((r: Runnable) => {
      val t = new Thread(r, "alpaca-prefetch")
      t.setDaemon(true)
      t
    })
}
