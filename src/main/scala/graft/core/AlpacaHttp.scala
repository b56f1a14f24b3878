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

  /** Lazy page iterator: yields each page's JSON while a
    * `next_page_token` is present; sleeps `rateLimitDelaySec` between
    * pages when configured. */
  def fetchAllPages(
      params: Seq[(String, String)],
      rateLimitDelaySec: Double = 0.0): Iterator[JsonNode] =
    new Iterator[JsonNode] {
      private var numPages = 0
      private var nextToken: Option[String] = None
      override def hasNext: Boolean = numPages < 1 || nextToken.isDefined
      override def next(): JsonNode = {
        if (rateLimitDelaySec > 0 && numPages > 0)
          Thread.sleep((rateLimitDelaySec * 1000).toLong)
        val pg = getPage(params, nextToken)
        numPages += 1
        nextToken = Option(pg.get("next_page_token"))
          .filter(n => !n.isNull)
          .map(_.asText())
          .filter(_.nonEmpty)
        pg
      }
    }
}

object AlpacaHttpClient {
  /** reference: `common.py:25,151-156` */
  val MaxRetries = 3
  val RetryStatuses: Set[Int] = Set(429, 500, 502, 503, 504)
}
