package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — the canonical market-data operator (bars-as-of-trades)
 * the reference delegates to users. Implemented Spark-first by
 * composition (preference (a) of the build rules): tag-and-union both
 * sides, one window pass per key ordered by time carrying the last
 * right-side value forward, then keep left rows. ONE shuffle on the
 * key, linear scan within each key — this is the 100 TB-safe shape
 * (a naive `t1.ts >= t2.ts` range join would be quadratic per key).
 *
 * Demonstrated on events: each 'click' is matched to the same user's
 * latest prior-or-equal 'signup'. Joined on exact epoch-micros longs
 * (events carry ns timestamps; both engines floor-divide to µs, so
 * the oracle — DuckDB's native ASOF LEFT JOIN — matches bit-for-bit).
 */
object AsofJoin {

  /** events with ts as raw epoch-micros long (exact, no tz concerns;
    * shape-normalized via Tables.events). */
  private def eventsUs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")

  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsUs(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), lit(1).as("is_left"),
        col("event_id"), lit(null).cast("bigint").as("s_us"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us"), lit(0).as("is_left"),
        lit(null).cast("bigint").as("event_id"), col("ts_us").as("s_us"))
    // right rows sort before left at equal ts_us → ties count as prior
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(signups)
      .withColumn("signup_us", last(col("s_us"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us").as("click_us"),
        col("signup_us"),
        (col("ts_us") - col("signup_us")).as("us_since_signup"))
      .orderBy(col("event_id"))
  }

  val asofJoinSql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, EPOCH_US(ts) AS click_us
      |  FROM events WHERE event_type = 'click'),
      |signups AS (
      |  SELECT user_id, EPOCH_US(ts) AS signup_us
      |  FROM events WHERE event_type = 'signup')
      |SELECT c.event_id, c.user_id, c.click_us, s.signup_us,
      |  c.click_us - s.signup_us AS us_since_signup
      |FROM clicks c ASOF LEFT JOIN signups s
      |  ON c.user_id = s.user_id AND c.click_us >= s.signup_us
      |ORDER BY c.event_id""".stripMargin

  /** The hot-user SCALE form of [[asofJoin]] (same technique as
    * AlpacaQueries.effSpreadBucketed, proven portable here): the
    * as-of window runs per (user, day-bucket) so one user's history
    * parallelizes across buckets, with the latest signup per bucket
    * (a plain max — the carried value IS the timestamp) rolled
    * forward over the tiny per-bucket spine and injected as a seed
    * row at each bucket's start. LEFT semantics preserved: a click
    * with no prior signup anywhere keeps a null signup_us. Gated
    * against the identical DuckDB ASOF LEFT JOIN oracle as the plain
    * form — the two implementations cross-prove each other. */
  def asofJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val W = 86400L * 1000000L // 1-day buckets
    val ev = eventsUs(spark, dir)
    // floor division (see AlpacaQueries.effSpreadBucketed): pre-1970
    // timestamps must bucket DOWN or the seed ordering breaks
    val bCol = expr(s"(ts_us - pmod(ts_us, ${W}L)) DIV ${W}L")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("b", bCol)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us"))
      .withColumn("b", bCol)
    val perBucket = signups.groupBy(col("user_id"), col("b"))
      .agg(max(col("ts_us")).as("bucket_s_us"))
    // merge-pinned: perBucket is |users|×|buckets| — linear in the
    // corpus, never broadcastable at scale (Spark's cost model
    // broadcast it at gate size)
    val spine = clicks.select(col("user_id"), col("b"))
      .union(signups.select(col("user_id"), col("b"))).distinct()
      .join(perBucket.hint("merge"), Seq("user_id", "b"), "left")
    val wSpine = Window.partitionBy(col("user_id")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = spine
      .withColumn("entry", last(col("bucket_s_us"), ignoreNulls = true).over(wSpine))
      .filter(col("entry").isNotNull)
      .select(col("user_id"), col("b"), (col("b") * W).as("ts_us"),
        lit(-1).as("is_left"), lit(null).cast("bigint").as("event_id"),
        col("entry").as("s_us"))
    val cRows = clicks.select(col("user_id"), col("b"), col("ts_us"),
      lit(1).as("is_left"), col("event_id"), lit(null).cast("bigint").as("s_us"))
    val sRows = signups.select(col("user_id"), col("b"), col("ts_us"),
      lit(0).as("is_left"), lit(null).cast("bigint").as("event_id"),
      col("ts_us").as("s_us"))
    val wBucket = Window.partitionBy(col("user_id"), col("b"))
      .orderBy(col("ts_us"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cRows.unionByName(sRows).unionByName(seeds)
      .withColumn("signup_us", last(col("s_us"), ignoreNulls = true).over(wBucket))
      .filter(col("is_left") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us").as("click_us"),
        col("signup_us"),
        (col("ts_us") - col("signup_us")).as("us_since_signup"))
      .orderBy(col("event_id"))
  }

  /** Forward as-of: each 'click' matched to the same user's NEXT
    * at-or-after 'purchase' (conversion attribution). Same
    * tag-union + one window pass shape, with a FOLLOWING frame and
    * first(ignoreNulls); right rows sort after left at equal ts so
    * a same-instant purchase counts as the next one — matching
    * DuckDB's `ASOF LEFT JOIN ... ON c.ts <= p.ts` direction. */
  def asofJoinForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsUs(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), lit(0).as("side"),
        col("event_id"), lit(null).cast("bigint").as("p_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), lit(1).as("side"),
        lit(null).cast("bigint").as("event_id"), col("ts_us").as("p_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.unionByName(purchases)
      .withColumn("purchase_us", first(col("p_us"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("event_id"), col("user_id"), col("ts_us").as("click_us"),
        col("purchase_us"),
        (col("purchase_us") - col("ts_us")).as("us_until_purchase"))
      .orderBy(col("event_id"))
  }

  /** Forward twin of [[asofJoinBucketed]]: per-(user, day-bucket)
    * windows with a FOLLOWING frame; the earliest purchase per bucket
    * (plain min) is rolled BACKWARD over the spine and injected as a
    * seed ordered after the bucket's own events, so a click whose
    * next purchase lives in a later bucket still finds it. Same
    * oracle as the plain forward form. */
  def asofJoinForwardBucketed(spark: SparkSession, dir: String): DataFrame = {
    val W = 86400L * 1000000L
    val ev = eventsUs(spark, dir)
    val bCol = expr(s"(ts_us - pmod(ts_us, ${W}L)) DIV ${W}L")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("b", bCol)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"))
      .withColumn("b", bCol)
    val perBucket = purchases.groupBy(col("user_id"), col("b"))
      .agg(min(col("ts_us")).as("bucket_p_us"))
    val spine = clicks.select(col("user_id"), col("b"))
      .union(purchases.select(col("user_id"), col("b"))).distinct()
      .join(perBucket.hint("merge"), Seq("user_id", "b"), "left")
    // earliest purchase in any LATER bucket: first(ignoreNulls) over
    // the forward-looking spine frame
    val wSpine = Window.partitionBy(col("user_id")).orderBy(col("b"))
      .rowsBetween(1, Window.unboundedFollowing)
    val seeds = spine
      .withColumn("entry", first(col("bucket_p_us"), ignoreNulls = true).over(wSpine))
      .filter(col("entry").isNotNull)
      // seed sorts after every in-bucket event: strictly past the
      // bucket's last possible instant (partition key is b, so the
      // out-of-range ts only orders, never re-buckets)
      .select(col("user_id"), col("b"), ((col("b") + 1) * W).as("ts_us"),
        lit(2).as("side"), lit(null).cast("bigint").as("event_id"),
        col("entry").as("p_us"))
    val cRows = clicks.select(col("user_id"), col("b"), col("ts_us"),
      lit(0).as("side"), col("event_id"), lit(null).cast("bigint").as("p_us"))
    val pRows = purchases.select(col("user_id"), col("b"), col("ts_us"),
      lit(1).as("side"), lit(null).cast("bigint").as("event_id"),
      col("ts_us").as("p_us"))
    val wBucket = Window.partitionBy(col("user_id"), col("b"))
      .orderBy(col("ts_us"), col("side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cRows.unionByName(pRows).unionByName(seeds)
      .withColumn("purchase_us", first(col("p_us"), ignoreNulls = true).over(wBucket))
      .filter(col("side") === 0)
      .select(col("event_id"), col("user_id"), col("ts_us").as("click_us"),
        col("purchase_us"),
        (col("purchase_us") - col("ts_us")).as("us_until_purchase"))
      .orderBy(col("event_id"))
  }

  val asofJoinForwardSql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, EPOCH_US(ts) AS click_us
      |  FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, EPOCH_US(ts) AS purchase_us
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, c.click_us, p.purchase_us,
      |  p.purchase_us - c.click_us AS us_until_purchase
      |FROM clicks c ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.click_us <= p.purchase_us
      |ORDER BY c.event_id""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "asof_join" -> ((asofJoin _, asofJoinSql)),
    "asof_join_bucketed" -> ((asofJoinBucketed _, asofJoinSql)),
    "asof_join_forward" -> ((asofJoinForward _, asofJoinForwardSql)),
    "asof_join_forward_bucketed" ->
      ((asofJoinForwardBucketed _, asofJoinForwardSql)))
}
