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
    "asof_join_forward" -> ((asofJoinForward _, asofJoinForwardSql)))
}
