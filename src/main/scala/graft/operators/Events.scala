package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream operators a training-data/events pipeline needs beyond
 * plain windowed aggregation: gap-based sessionization and JSON
 * property extraction. Both single-shuffle (one hash partition on
 * user_id / event_type) and fully codegen'd.
 */
object Events {

  /** events with exact epoch-micros (shape-normalized ts → µs long). */
  private def eventsUs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")

  private val GapUs: Long = 30L * 60L * 1000000L // 30-minute session gap

  /** Sessionization (gaps-and-islands): a >30-min silence starts a new
    * session; one window shuffle on user_id, linear within user. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    eventsUs(spark, dir)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > GapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val sessionizeSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, EPOCH_US(ts) AS ts_us,
       |    CASE WHEN LAG(EPOCH_US(ts)) OVER w IS NULL
       |           OR EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w > $GapUs
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id)),
       |sessions AS (
       |  SELECT user_id, ts_us,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_id
       |  FROM flagged)
       |SELECT user_id, session_id, COUNT(*) AS n_events,
       |  MIN(ts_us) AS start_us, MAX(ts_us) - MIN(ts_us) AS duration_us
       |FROM sessions
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** JSON property extraction (the props column is a JSON string):
    * per-event-type aggregates over `$$.k`. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val jsonExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Semi-structured VARIANT processing (Spark 4's VariantType — the
    * engine-native answer to JSON columns): each event is re-encoded
    * as a nested JSON document (object + array + mixed types), parsed
    * ONCE into a variant, and fields are extracted with TYPED paths
    * (`variant_get(v, '$.meta.u', 'bigint')`, array index
    * `'$.vals[0]'`), plus `try_variant_get` on an absent path (NULL,
    * never an error). The oracle computes the same aggregates
    * DIRECTLY from the source columns — so any mis-parse, mis-route
    * or precision loss in the encode→parse→extract round-trip breaks
    * the hash (doubles must round-trip bit-exactly through the JSON
    * text).
    *
    * Scale: variants are parsed in the scan projection (one pass, no
    * UDF); at 100 TB the variant column is stored ONCE (shredded
    * parquet) and every query pays typed extraction instead of
    * repeated string JSON parsing — the reason this type exists. */
  def q33Variant(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("vj", concat(
        lit("{\"meta\": {\"u\": "), col("user_id"),
        lit(", \"k\": "), get_json_object(col("props"), "$.k"),
        lit("}, \"vals\": ["), col("value").cast("string"),
        lit("]}")))
      .withColumn("v", expr("parse_json(vj)"))
      .select(col("event_type"),
        expr("variant_get(v, '$.meta.u', 'bigint')").as("u"),
        expr("variant_get(v, '$.meta.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.vals[0]', 'double')").as("v0"),
        expr("try_variant_get(v, '$.absent.path', 'string')").as("miss"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("u")).as("sum_u"),
        sum(col("k")).as("sum_k"),
        sum(col("v0").cast("decimal(18,2)")).cast("double").as("sum_val"),
        sum(when(col("miss").isNull, 1L).otherwise(0L)).as("n_absent"))
      .orderBy(col("event_type"))

  val q33Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(user_id) AS BIGINT) AS sum_u,
      |  CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS sum_k,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
      |  COUNT(*) AS n_absent
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** VARIANT through STORAGE: the q33 variants written to parquet as a
    * native `variant` column (Spark 4 writes the binary value+metadata
    * pair; the read-back schema is `variant`, not a struct or string)
    * and extracted AFTER the round-trip. Same oracle as q33 — a
    * mis-encoded, truncated, or re-typed variant surfaces as a hash
    * break. At 100 TB this is the point of the type: parse once at
    * ingest, store the binary form, and every later query pays typed
    * extraction on the stored bytes (with column shredding as the
    * format matures), never a JSON re-parse. */
  def sinkVariantRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("variant_sink", dir)
    eventsUs(spark, dir)
      .withColumn("vj", concat(
        lit("{\"meta\": {\"u\": "), col("user_id"),
        lit(", \"k\": "), get_json_object(col("props"), "$.k"),
        lit("}, \"vals\": ["), col("value").cast("string"),
        lit("]}")))
      .select(col("event_type"), expr("parse_json(vj)").as("v"))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .select(col("event_type"),
        expr("variant_get(v, '$.meta.u', 'bigint')").as("u"),
        expr("variant_get(v, '$.meta.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.vals[0]', 'double')").as("v0"),
        expr("try_variant_get(v, '$.absent.path', 'string')").as("miss"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("u")).as("sum_u"),
        sum(col("k")).as("sum_k"),
        sum(col("v0").cast("decimal(18,2)")).cast("double").as("sum_val"),
        sum(when(col("miss").isNull, 1L).otherwise(0L)).as("n_absent"))
      .orderBy(col("event_type"))
  }

  /** Collation-aware aggregation (Spark 4 collations): event types
    * re-cased by parity so every logical key exists in two binary
    * spellings, then grouped under UTF8_LCASE — the collated GROUP BY
    * must merge the spellings while `count(distinct)` over the
    * binary-collated column still sees both. The group's REPORTED key
    * is deliberately `min(binary)` (deterministic), never the collated
    * grouping value itself — which spelling Spark surfaces for a
    * collated key depends on arrival order. Oracle: GROUP BY
    * LOWER(...) — equivalent to UTF8_LCASE on this ASCII domain. */
  def q36Collation(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("mixed", expr(
        "CASE WHEN event_id % 2 = 0 THEN upper(event_type) ELSE event_type END"))
      .groupBy(expr("mixed COLLATE UTF8_LCASE").as("ck"))
      .agg(min(col("mixed")).as("key_repr"),
        count(lit(1)).as("n"),
        countDistinct(col("mixed")).as("n_spellings"))
      .select(col("key_repr"), col("n"), col("n_spellings"))
      .orderBy(col("key_repr"))

  val q36Sql: String =
    """WITH m AS (
      |  SELECT CASE WHEN event_id % 2 = 0 THEN UPPER(event_type)
      |              ELSE event_type END AS mixed
      |  FROM events)
      |SELECT MIN(mixed) AS key_repr, COUNT(*) AS n,
      |  COUNT(DISTINCT mixed) AS n_spellings
      |FROM m GROUP BY LOWER(mixed)
      |ORDER BY key_repr""".stripMargin

  /** Spark's NATIVE session_window next to q14's manual
    * gaps-and-islands — same sessions, different operator. Boundary
    * semantics differ by design: session_window's window is the
    * half-open [first, last+gap), so an event EXACTLY gap after the
    * last starts a new session (the manual q14 `diff > gap` merges
    * it); the oracle islands with `>= gap` to match. Session-window
    * aggregation is partial-aggregable with session merge — the
    * streaming-native shape (the same expression works under
    * `groupBy(session_window(...))` on a stream). */
  def q32SessionWindow(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
      .select(col("user_id"), col("start_us"), col("n_events"), col("duration_us"))
      .orderBy(col("user_id"), col("start_us"))

  val q32Sql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, EPOCH_US(ts) AS ts_us,
       |    CASE WHEN LAG(EPOCH_US(ts)) OVER w IS NULL
       |           OR EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w >= $GapUs
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id)),
       |sessions AS (
       |  SELECT user_id, ts_us,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_id
       |  FROM flagged)
       |SELECT user_id, MIN(ts_us) AS start_us, COUNT(*) AS n_events,
       |  MAX(ts_us) - MIN(ts_us) AS duration_us
       |FROM sessions
       |GROUP BY user_id, session_id
       |ORDER BY user_id, start_us""".stripMargin

  private val FunnelWindowUs: Long = 24L * 3600L * 1000000L // 24 h conversion window

  /** Ordered funnel analysis (view → click-within-24h →
    * purchase-within-24h): the greedy stage times — t1 = first view,
    * t2 = first click in (t1, t1+24h], t3 = first purchase in
    * (t2, t2+24h] — computed as three chained whole-partition window
    * MINs over ONE user_id shuffle (the three WindowExecs share the
    * same partitioning, so Spark reuses the exchange and sort);
    * stage counts fold the per-user constants. All comparisons are
    * exact epoch-micros BIGINTs. At 100 TB this is one shuffle of
    * (user_id, ts, type) triples — no joins, no self-products — and
    * greedy first-occurrence-within-window is the standard funnel
    * conversion definition. */
  def q27Funnel(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    eventsUs(spark, dir)
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts_us"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts_us") > col("t1") &&
          col("ts_us") <= col("t1") + FunnelWindowUs,
          col("ts_us"))).over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts_us") > col("t2") &&
          col("ts_us") <= col("t2") + FunnelWindowUs,
          col("ts_us"))).over(byUser))
      .groupBy(col("user_id"))
      .agg(max(when(col("t3").isNotNull, 3L)
        .when(col("t2").isNotNull, 2L)
        .when(col("t1").isNotNull, 1L).otherwise(0L)).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))
  }

  val q27FunnelSql: String =
    s"""WITH e AS (SELECT user_id, event_type, EPOCH_US(ts) AS ts_us FROM events),
      |s1 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
      |    OVER (PARTITION BY user_id) AS t1 FROM e),
      |s2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us > t1
      |      AND ts_us <= t1 + $FunnelWindowUs THEN ts_us END)
      |    OVER (PARTITION BY user_id) AS t2 FROM s1),
      |s3 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > t2
      |      AND ts_us <= t2 + $FunnelWindowUs THEN ts_us END)
      |    OVER (PARTITION BY user_id) AS t3 FROM s2),
      |per_user AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
      |             WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS stage
      |  FROM s3 GROUP BY user_id)
      |SELECT CAST(stage AS BIGINT) AS stage, COUNT(*) AS n_users
      |FROM per_user GROUP BY stage ORDER BY stage""".stripMargin

  /** SQL scripting (Spark 4's SQL/PSM control flow — `BEGIN`/
    * `DECLARE`/`WHILE`/`SET`): an iterative threshold search that a
    * single declarative query cannot express as written — double a
    * BIGINT cutoff until no more than 200 events clear it, then report
    * the cutoff and the survivors' aggregates. Each loop step is one
    * scalar-subquery count (a full codegen'd scan+agg job); the
    * variable lives driver-side, so the pattern is "driver control
    * flow, cluster data flow" — exactly how an iterative pipeline
    * (fixpoint, calibration sweep) runs at 100 TB. The final SELECT
    * resolves the table through `IDENTIFIER(:name)`-style indirection
    * (`IDENTIFIER('<view>')`), exercising late-bound identifiers.
    * Oracle: the closed form — the least power-of-two cutoff whose
    * survivor count is ≤ 200 (floor 1: the script never halves).
    * Money math follows the q1 DECIMAL contract. */
  def q37SqlScripting(spark: SparkSession, dir: String): DataFrame = {
    // scripting.enabled gates the PARSER only; the script body (and its
    // driver-side WHILE loop) executes inside this spark.sql call, so
    // restoring the previous value afterwards cannot change the plan —
    // it just stops the flag leaking into every later gate's session.
    val prevScripting = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    val view = "graft_script_events"
    eventsUs(spark, dir).createOrReplaceTempView(view)
    try spark.sql(
      s"""BEGIN
         |  DECLARE thr BIGINT DEFAULT 1;
         |  DECLARE n BIGINT DEFAULT 0;
         |  SET n = (SELECT COUNT(*) FROM $view WHERE value >= thr);
         |  WHILE n > 200 DO
         |    SET thr = thr * 2;
         |    SET n = (SELECT COUNT(*) FROM $view WHERE value >= thr);
         |  END WHILE;
         |  SELECT thr AS threshold, COUNT(*) AS n_above,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_above
         |  FROM IDENTIFIER('$view') WHERE value >= thr;
         |END""".stripMargin)
    finally spark.conf.set("spark.sql.scripting.enabled", prevScripting)
  }

  val q37Sql: String =
    """WITH ks AS (
      |  SELECT CAST(POW(2, k) AS BIGINT) AS thr FROM range(0, 40) t(k)),
      |counted AS (
      |  SELECT thr,
      |    (SELECT COUNT(*) FROM events WHERE value >= thr) AS n FROM ks),
      |pick AS (SELECT COALESCE(MIN(thr), 1) AS thr FROM counted WHERE n <= 200)
      |SELECT (SELECT thr FROM pick) AS threshold, COUNT(*) AS n_above,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_above
      |FROM events WHERE value >= (SELECT thr FROM pick)""".stripMargin
  // ^ scalar-subquery form, not GROUP BY p.thr: the script's final
  //   SELECT aggregates WITHOUT grouping, so on an EMPTY corpus Spark
  //   emits one (thr, 0, NULL) row — a grouped oracle would emit zero
  //   rows and diverge (r9 fuzz hardening; values identical otherwise)

  /** Sketch-based top-k (Spark 4.1's `approx_top_k`): frequent-item
    * counts per event_type via the native ItemsSketch aggregate,
    * exploded to (item, cnt) rows. The gate pins the EXACTNESS
    * contract that makes a sketch oracle-able: with maxItemsTracked
    * (10000) far above the true cardinality (≤15 across fixtures and
    * the fuzz's mixed pool), the sketch degrades to exact counting,
    * so the DuckDB oracle is a plain GROUP BY. k (100) also exceeds
    * the cardinality, so the cut never lands inside the value set and
    * no boundary tie can make it nondeterministic (k=10 failed this
    * the moment the fuzz pool grew past 10 types — r10 find). At
    * 100 TB the same one-pass partial-aggregable sketch replaces the
    * full shuffle of a GROUP BY when cardinality explodes — this gate
    * proves the operator wiring and the exact-regime semantics. */
  def q39ApproxTopK(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .agg(expr("approx_top_k(event_type, 100, 10000)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("cnt"))
      .orderBy(col("cnt").desc, col("item"))

  val q39Sql: String =
    """SELECT event_type AS item, COUNT(*) AS cnt
      |FROM events GROUP BY event_type
      |ORDER BY cnt DESC, item""".stripMargin

  /** Error-safe arithmetic (`try_divide` / `try_multiply` /
    * `try_cast`): the ANSI-mode escape hatches that return NULL
    * instead of failing the job — the semantics a 100 TB pipeline
    * needs, where one poison row must not kill a 1000-executor stage.
    * Three legs, each with rows on BOTH sides of the boundary:
    * division by a data-dependent zero (user_id ≡ 3 mod 7), BIGINT
    * multiplication overflow ((user_id+1)·2⁵⁶ overflows exactly when
    * user_id ≥ 127 — the corpus max is ~149, so both regimes occur),
    * and string→int try_cast over a mixed numeric/alpha column.
    * All aggregates are NULL-counts (exact integers) plus one
    * DECIMAL-summed survivor total; the oracle crosses the same
    * boundaries natively (DuckDB x/0 → NULL, TRY_CAST, and the
    * closed-form overflow threshold maxlong // 2⁵⁶ = 127).
    *
    * SCALE: try_* failures are exception-driven inside codegen —
    * measured ≈34 µs/row on the overflow path (3.1 s/100k rows when
    * 91% overflow) and ≈15 µs/row on failing string casts. Fine when
    * poison rows are rare (the production regime); catastrophic when
    * failure is the common case. So both hot legs pre-guard with a
    * cheap branch that NULLs the rows try_* would certainly reject —
    * the closed-form overflow bound (exact: a·2⁵⁶ with a>0 overflows
    * iff a > maxlong DIV 2⁵⁶), and a numeric-shape regexp prefilter
    * (under-approximates only on strings try_cast also NULLs) —
    * leaving try_* the decider on everything admitted. Measured
    * 10×/4× on the two legs, value-identical on all 100k rows. */
  def q40TryArith(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("div_try",
        expr("try_divide(value, CAST(user_id % 7 - 3 AS DOUBLE))"))
      .withColumn("mul_try", expr(
        "CASE WHEN user_id + 1L > 9223372036854775807L DIV 72057594037927936L " +
          "THEN CAST(NULL AS BIGINT) " +
          "ELSE try_multiply(user_id + 1L, 72057594037927936L) END"))
      // the guard's edge class is exactly the padding the ORACLE
      // trims: measured on both engines, DuckDB TRY_CAST skips
      // precisely Java \s (space \t\n\x0B\f\r) and nothing else,
      // while Spark's try_cast additionally trims ASCII control chars
      // (\x00-\x08, \x0E-\x1F, \x7F) — so the guard must REJECT
      // control padding or n_bad_cast diverges (Spark parses, DuckDB
      // NULLs). Neither engine trims Unicode \p{Z} spaces, so \p{Z}
      // in the class is inert. The r9 widening ("at least as wide as
      // what try_cast trims") used the wrong criterion — oracle-exact,
      // not Spark-exact, is what parity needs.
      .withColumn("cast_try", expr(
        "try_cast(CASE WHEN user_id % 5 = 0 THEN CAST(user_id AS STRING) " +
          "WHEN event_type RLIKE " +
          "'^\\\\s*[+-]?[0-9]+(\\\\.[0-9]*)?\\\\s*$' " +
          "THEN event_type ELSE NULL END AS INT)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("div_try").isNull, 1L).otherwise(0L)).as("n_div0"),
        sum(when(col("mul_try").isNull, 1L).otherwise(0L)).as("n_mul_ovf"),
        sum(when(col("cast_try").isNull, 1L).otherwise(0L)).as("n_bad_cast"),
        sum(when(col("div_try").isNotNull,
          col("value").cast("decimal(18,2)")).otherwise(lit(null)))
          .cast("double").as("sum_ok"))
      .orderBy(col("event_type"))

  val q40Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  COUNT(*) FILTER (WHERE value / (user_id % 7 - 3) IS NULL) AS n_div0,
      |  COUNT(*) FILTER (WHERE user_id + 1 >
      |    9223372036854775807 // 72057594037927936) AS n_mul_ovf,
      |  COUNT(*) FILTER (WHERE TRY_CAST(
      |    CASE WHEN user_id % 5 = 0 THEN CAST(user_id AS VARCHAR)
      |         ELSE event_type END AS INT) IS NULL) AS n_bad_cast,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |    FILTER (WHERE user_id % 7 <> 3) AS DOUBLE) AS sum_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Datetime surface parity (truncation, interval arithmetic,
    * day-of-week, hour extraction): weekly rollup where the week key
    * is `date_trunc('week', ts)` (Monday-start in both engines), the
    * first/last event instants are shifted by a 90-minute interval in
    * exact epoch-µs arithmetic and crossed as formatted strings (the
    * timestamp parity contract), weekend counting bridges the two
    * day-numbering conventions explicitly (Spark `weekday` Mon=0 ⇔
    * DuckDB `isodow` Mon=1), and hour-of-day distincts use the shared
    * 0–23 convention. */
  def q42Datetime(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("wk"))
      .agg(count(lit(1)).as("n"),
        sum(when(expr("weekday(ts)") >= 5, 1L).otherwise(0L)).as("n_weekend"),
        countDistinct(hour(col("ts"))).as("n_hours"),
        date_format(timestamp_micros(min(col("ts_us")) + 5400000000L),
          "yyyy-MM-dd HH:mm:ss").as("first_shifted"),
        date_format(timestamp_micros(max(col("ts_us")) + 5400000000L),
          "yyyy-MM-dd HH:mm:ss").as("last_shifted"))
      .orderBy(col("wk"))

  val q42Sql: String =
    """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk,
      |  COUNT(*) AS n,
      |  COUNT(*) FILTER (WHERE isodow(ts) >= 6) AS n_weekend,
      |  COUNT(DISTINCT EXTRACT(hour FROM ts)) AS n_hours,
      |  strftime(make_timestamp(MIN(EPOCH_US(ts)) + 5400000000),
      |    '%Y-%m-%d %H:%M:%S') AS first_shifted,
      |  strftime(make_timestamp(MAX(EPOCH_US(ts)) + 5400000000),
      |    '%Y-%m-%d %H:%M:%S') AS last_shifted
      |FROM events GROUP BY date_trunc('week', ts) ORDER BY wk""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q14_sessionize" -> ((sessionize _, sessionizeSql)),
    "q15_json_extract" -> ((jsonExtract _, jsonExtractSql)),
    "q33_variant" -> ((q33Variant _, q33Sql)),
    "sink_variant_roundtrip" -> ((sinkVariantRoundtrip _, q33Sql)),
    "q36_collation" -> ((q36Collation _, q36Sql)),
    "q37_sql_scripting" -> ((q37SqlScripting _, q37Sql)),
    "q39_approx_topk" -> ((q39ApproxTopK _, q39Sql)),
    "q40_try_arith" -> ((q40TryArith _, q40Sql)),
    "q42_datetime" -> ((q42Datetime _, q42Sql)),
    "q32_session_window" -> ((q32SessionWindow _, q32Sql)),
    "q27_funnel" -> ((q27Funnel _, q27FunnelSql)))
}
