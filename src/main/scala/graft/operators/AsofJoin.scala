package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — the canonical market-data operator (bars-as-of-trades)
 * the reference delegates to users. Implemented Spark-first by
 * composition (preference (a) of the build rules): tag both sides in
 * ONE conditional projection over the shared events scan (clicks and
 * signups are disjoint `event_type` filters of the same table, so a
 * union of two scans would read the file twice for nothing), then one
 * window pass per key ordered by time carrying the last right-side
 * value forward, then keep left rows. ONE scan, ONE shuffle on the
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

  /** Tagged rows for a (left=click, right=`rightType`) as-of, from a
    * single scan: `side` flags the side, `event_id` survives only
    * on left rows, `r_us` (the carried value) only on right rows.
    * The side flag values control tie order at equal instants
    * (lower sorts first). */
  private def taggedRows(spark: SparkSession, dir: String,
      rightType: String, leftFlag: Int, rightFlag: Int): DataFrame = {
    val isLeft = col("event_type") === "click"
    // explicit non-null key contract: an as-of matches on key EQUALITY,
    // so a null user_id can never match (and a window partition would
    // wrongly group all null users together); dropping them up front
    // also keeps the bucketed form's two consumers of the shared scan
    // plan-identical (an inferred-only IsNotNull on one branch would
    // break ReuseExchange)
    eventsUs(spark, dir)
      .filter(col("event_type").isin("click", rightType) &&
        col("user_id").isNotNull)
      .select(col("user_id"), col("ts_us"),
        when(isLeft, leftFlag).otherwise(rightFlag).as("side"),
        when(isLeft, col("event_id")).as("event_id"),
        when(!isLeft, col("ts_us")).as("r_us"))
  }

  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    // right rows sort before left at equal ts_us → ties count as prior
    val rows = taggedRows(spark, dir, "signup", leftFlag = 1, rightFlag = 0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .withColumn("signup_us", last(col("r_us"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
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
    * parallelizes across buckets. ONE window pass computes, per row,
    * the in-bucket carry AND, per bucket, its latest signup
    * (full-partition frame) plus a row number nominating one
    * representative row per bucket. The rn==1 rows ARE the
    * (user, bucket) spine — no separate distinct/aggregate pass, so
    * each input relation is scanned ONCE: the spine branch re-consumes
    * the identical shuffle and ReuseExchange collapses it onto the
    * first (`event_id` joins the window ordering as a never-reached
    * tiebreak precisely so both consumers prune to the same columns —
    * unequal pruning would break exchange canonical equality and
    * resurrect the second scan). The spine's cross-bucket running
    * carry is the only serial window left, on a relation
    * |users|×|buckets| — orders of magnitude smaller than the data.
    * LEFT semantics preserved: a click with no prior signup anywhere
    * keeps a null signup_us (both carries null → coalesce null).
    * Gated against the identical DuckDB ASOF LEFT JOIN oracle as the
    * plain form — the two implementations cross-prove each other. */
  def asofJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val W = 86400L * 1000000L // 1-day buckets
    // floor division: pre-1970 timestamps must bucket DOWN or the
    // cross-bucket carry ordering breaks
    val rows = taggedRows(spark, dir, "signup", leftFlag = 1, rightFlag = 0)
      .withColumn("b", expr(s"(ts_us - pmod(ts_us, ${W}L)) DIV ${W}L"))
      // b is a join key below; the explicit IsNotNull on the SHARED
      // subtree keeps both consumers' pushed filters identical (the
      // join would infer it, but the inference pushes past the data
      // window on one branch only, breaking ReuseExchange)
      .filter(col("b").isNotNull)
    val wB = Window.partitionBy(col("user_id"), col("b"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
    val winRows = rows
      .withColumn("in_carry", last(col("r_us"), ignoreNulls = true)
        .over(wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bucket_s", last(col("r_us"), ignoreNulls = true)
        .over(wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(wB))
    // standing signup ENTERING bucket k = latest preceding bucket's
    // bucket_s: last(ignoreNulls) over the tiny ordered spine
    val wSpine = Window.partitionBy(col("user_id")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val entries = winRows.filter(col("rn") === 1)
      .select(col("user_id"), col("b"), col("bucket_s"))
      .withColumn("entry", last(col("bucket_s"), ignoreNulls = true).over(wSpine))
      .select(col("user_id"), col("b"), col("entry"))
    // merge-pinned: entries is |users|×|buckets| — linear in the
    // corpus, never broadcastable at scale (Spark's cost model would
    // broadcast it at gate size). INNER join ≡ left here (rn==1
    // guarantees a spine row for every non-empty group) and keeps
    // null-inference symmetric across both branches for ReuseExchange.
    winRows.join(entries.hint("merge"), Seq("user_id", "b"))
      .withColumn("signup_us", coalesce(col("in_carry"), col("entry")))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us").as("click_us"),
        col("signup_us"),
        (col("ts_us") - col("signup_us")).as("us_since_signup"))
      .orderBy(col("event_id"))
  }

  /** Forward as-of: each 'click' matched to the same user's NEXT
    * at-or-after 'purchase' (conversion attribution). Same single-scan
    * tag + one window pass shape, with a FOLLOWING frame and
    * first(ignoreNulls); right rows sort after left at equal ts so
    * a same-instant purchase counts as the next one — matching
    * DuckDB's `ASOF LEFT JOIN ... ON c.ts <= p.ts` direction. */
  def asofJoinForward(spark: SparkSession, dir: String): DataFrame = {
    val rows = taggedRows(spark, dir, "purchase", leftFlag = 0, rightFlag = 1)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    rows
      .withColumn("purchase_us", first(col("r_us"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("event_id"), col("user_id"), col("ts_us").as("click_us"),
        col("purchase_us"),
        (col("purchase_us") - col("ts_us")).as("us_until_purchase"))
      .orderBy(col("event_id"))
  }

  /** Forward twin of [[asofJoinBucketed]], same single-scan shape with
    * FOLLOWING frames: the in-bucket forward carry and the bucket's
    * earliest purchase come from one window pass; the rn==1 spine rows
    * roll the per-bucket min BACKWARD (frame 1..unboundedFollowing →
    * nearest later non-empty bucket's earliest purchase), so a click
    * whose next purchase lives in a later bucket still finds it.
    * Same oracle as the plain forward form. */
  def asofJoinForwardBucketed(spark: SparkSession, dir: String): DataFrame = {
    val W = 86400L * 1000000L
    val rows = taggedRows(spark, dir, "purchase", leftFlag = 0, rightFlag = 1)
      .withColumn("b", expr(s"(ts_us - pmod(ts_us, ${W}L)) DIV ${W}L"))
      .filter(col("b").isNotNull) // see asofJoinBucketed
    val wB = Window.partitionBy(col("user_id"), col("b"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
    val winRows = rows
      .withColumn("in_carry", first(col("r_us"), ignoreNulls = true)
        .over(wB.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("bucket_p", first(col("r_us"), ignoreNulls = true)
        .over(wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(wB))
    // earliest purchase in any LATER bucket: first(ignoreNulls) over
    // the forward-looking spine frame (bucket time-ordering makes the
    // nearest later bucket's min the global next)
    val wSpine = Window.partitionBy(col("user_id")).orderBy(col("b"))
      .rowsBetween(1, Window.unboundedFollowing)
    val entries = winRows.filter(col("rn") === 1)
      .select(col("user_id"), col("b"), col("bucket_p"))
      .withColumn("entry", first(col("bucket_p"), ignoreNulls = true).over(wSpine))
      .select(col("user_id"), col("b"), col("entry"))
    winRows.join(entries.hint("merge"), Seq("user_id", "b"))
      .withColumn("purchase_us", coalesce(col("in_carry"), col("entry")))
      .filter(col("side") === 0)
      .select(col("event_id"), col("user_id"), col("ts_us").as("click_us"),
        col("purchase_us"),
        (col("purchase_us") - col("ts_us")).as("us_until_purchase"))
      .orderBy(col("event_id"))
  }

  /** Nearest as-of (pandas merge_asof direction='nearest'): each
    * 'click' matched to the same user's temporally NEAREST 'signup'
    * in EITHER direction, ties to the prior one. Both directional
    * carries come from ONE window operator (same partition/order,
    * backward and forward frames share the physical Window), so the
    * cost is identical to a single-direction as-of: one scan, one
    * shuffle on the key, linear within the key. At equal instants the
    * backward carry already holds the same-instant signup (distance
    * 0, wins the tie), so the forward frame's excluding it is
    * immaterial. Oracle: two DuckDB ASOF joins + the same tie CASE. */
  def asofJoinNearest(spark: SparkSession, dir: String): DataFrame = {
    val rows = taggedRows(spark, dir, "signup", leftFlag = 1, rightFlag = 0)
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"))
    rows
      .withColumn("b_us", last(col("r_us"), ignoreNulls = true)
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("f_us", first(col("r_us"), ignoreNulls = true)
        .over(ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("side") === 1)
      .withColumn("signup_us",
        when(col("b_us").isNull, col("f_us"))
          .when(col("f_us").isNull, col("b_us"))
          .when(col("ts_us") - col("b_us") <= col("f_us") - col("ts_us"),
            col("b_us"))
          .otherwise(col("f_us")))
      .select(col("event_id"), col("user_id"), col("ts_us").as("click_us"),
        col("signup_us"),
        (col("signup_us") - col("ts_us")).as("us_to_signup"))
      .orderBy(col("event_id"))
  }

  val asofJoinNearestSql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, EPOCH_US(ts) AS click_us
      |  FROM events WHERE event_type = 'click'),
      |signups AS (
      |  SELECT user_id, EPOCH_US(ts) AS signup_us
      |  FROM events WHERE event_type = 'signup'),
      |bwd AS (
      |  SELECT c.event_id, c.user_id, c.click_us, s.signup_us AS b_us
      |  FROM clicks c ASOF LEFT JOIN signups s
      |    ON c.user_id = s.user_id AND c.click_us >= s.signup_us),
      |fwd AS (
      |  SELECT c.event_id, s.signup_us AS f_us
      |  FROM clicks c ASOF LEFT JOIN signups s
      |    ON c.user_id = s.user_id AND c.click_us <= s.signup_us)
      |SELECT b.event_id, b.user_id, b.click_us,
      |  CASE WHEN b_us IS NULL THEN f_us
      |       WHEN f_us IS NULL THEN b_us
      |       WHEN (click_us - b_us) <= (f_us - click_us) THEN b_us
      |       ELSE f_us END AS signup_us,
      |  CASE WHEN b_us IS NULL THEN f_us
      |       WHEN f_us IS NULL THEN b_us
      |       WHEN (click_us - b_us) <= (f_us - click_us) THEN b_us
      |       ELSE f_us END - click_us AS us_to_signup
      |FROM bwd b JOIN fwd f USING (event_id)
      |ORDER BY b.event_id""".stripMargin

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
    "asof_join_nearest" -> ((asofJoinNearest _, asofJoinNearestSql)),
    "asof_join_forward" -> ((asofJoinForward _, asofJoinForwardSql)),
    "asof_join_forward_bucketed" ->
      ((asofJoinForwardBucketed _, asofJoinForwardSql)))
}
