package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-pattern gates: the data-engineering idioms a 100 TB lake
  * runs daily — slowly-changing-dimension builds, width_bucket
  * histogram profiling, and Z-order clustering layout — each
  * DuckDB-oracle-gated on the shared tables. (Cohort retention,
  * funnels, and lateral top-k already gate as q20/q27/q31.)
  *
  * The reference connector delegates all relational work to Spark
  * (SURVEY.md §2.7–2.10); these extend the delegated surface the same
  * way the q1–q62 gates do. */
object Warehouse {
  import Tables.t

  /** SCD Type-2 dimension build from a change log. `orders` is read
    * as the change stream of a customer attribute (`o_orderpriority`);
    * the build is the canonical two-pass form:
    *
    *   1. change detection — `lag()` over (entity, change-time) drops
    *      rows whose tracked attribute equals the previous value (a
    *      re-statement, not a change);
    *   2. interval assembly — over the surviving change rows,
    *      `row_number()` numbers versions and `lead()` closes each
    *      validity interval at the next change (`9999-12-31` sentinel
    *      + is_current flag for the open row).
    *
    * Both passes share ONE partitioning (o_custkey), so Catalyst
    * plans a single hash exchange and runs both windows in the same
    * stage — the filter between them is narrow. At 100 TB the entity
    * key is the natural partitioner and versions-per-entity is small
    * (bounded window state); ties on change-time are broken by
    * o_orderkey so the build is deterministic under any layout.
    * Dates cross as formatted strings (the timestamp parity
    * contract). */
  def q63Scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .filter(col("o_custkey") % 50 === 1)
      .select(col("o_custkey"), col("o_orderpriority").as("prio"),
        col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev", lag(col("prio"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("prio"))
      .withColumn("version", row_number().over(w))
      .withColumn("nxt", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("version"), col("prio"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(col("nxt"), "yyyy-MM-dd"), lit("9999-12-31"))
          .as("valid_to"),
        when(col("nxt").isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy(col("o_custkey"), col("version"))
  }

  val q63Sql: String =
    """WITH seq AS (
      |  SELECT o_custkey, o_orderpriority AS prio, o_orderdate, o_orderkey,
      |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders WHERE o_custkey % 50 = 1),
      |chg AS (SELECT * FROM seq WHERE prev IS NULL OR prev <> prio)
      |SELECT o_custkey, CAST(ROW_NUMBER() OVER w AS INT) AS version, prio,
      |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
      |  COALESCE(strftime(lead(o_orderdate) OVER w, '%Y-%m-%d'),
      |    '9999-12-31') AS valid_to,
      |  CASE WHEN lead(o_orderdate) OVER w IS NULL
      |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_current
      |FROM chg
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, version""".stripMargin

  /** `width_bucket` histogram profiling — the one-pass equi-width
    * profile a table-stats job emits per numeric column. Spark's
    * codegen'd WidthBucket computes floor((v-min)/((max-min)/n))+1
    * and PINS out-of-range values to buckets 0 / n+1; the oracle
    * spells out the identical IEEE double expression and mirrors the
    * pinning with GREATEST/LEAST, so the two engines agree at EVERY
    * scale factor — including ones whose o_totalprice exceeds the
    * bounds (TPC-H reaches ~555k at sf≥1, so the old 500k max
    * silently diverged above 525k). `n_out_of_range` makes any
    * bounds violation loud: nonzero only in the pinned buckets, and
    * both engines count it from the raw predicate, not the bucket.
    * Plan: scan → partial agg → ≤22-row final agg; nothing but the
    * histogram ever shuffles. */
  def q64Histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(width_bucket(col("o_totalprice"),
        lit(0.0d), lit(600000.0d), lit(20L)).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_totalprice") < 0.0d ||
          col("o_totalprice") >= 600000.0d, 1L).otherwise(0L))
          .as("n_out_of_range"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"))
      .orderBy(col("bucket"))

  val q64Sql: String =
    """SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0)
      |    / ((600000.0 - 0.0) / 20)) + 1 AS BIGINT), 0), 21) AS bucket,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice >= 600000.0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_range,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  private val mortonBits = 8
  /** Unrolled 8-bit × 8-bit Morton interleave: z = Σ bit_i(x)≪2i |
    * bit_i(y)≪(2i+1). The same literal expression string feeds both
    * engines — exact integer shifts, no doubles. */
  private val zExprSql: String = (0 until mortonBits).map { i =>
    s"((((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1}))"
  }.mkString(" + ")

  /** Z-order clustering layout — the data-layout side of scan pruning
    * at 100 TB. Rows are sorted by the Morton interleave of two
    * pruning dimensions (customer bucket, order-day bucket) and cut
    * into fixed-size blocks ("files"); the gate emits each block's
    * per-dimension min/max envelope — exactly the footer stats a
    * format like Parquet would persist and a reader would prune on. A
    * linear sort on either dimension gives tight envelopes on that
    * dimension and full-range envelopes on the other; the Z-curve
    * bounds BOTH, which is the entire point of Z-ordering (the gate's
    * envelopes demonstrate it: max-min spans ≤ 64 of 256 on both
    * dims at sf0.01). The global rank is [[Ranks.globalRowNumber]] —
    * monotone z-bucket (the key's high 8 bits) + broadcast prefix
    * offsets — NOT a partitionless window (which would plan a
    * single-partition sort, the scale-killer this gate exists to
    * avoid); block id = rank div B keeps blocks size-balanced by
    * construction. */
  def q65ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val dims = t(spark, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_custkey") % 256).cast("int").as("x"),
        (datediff(col("o_orderdate"),
          to_date(lit("1992-01-01"))) % 256).cast("int").as("y"))
      .withColumn("z", expr(zExprSql))
    Ranks.globalRowNumber(dims, expr("z div 256"), "rn",
      col("z"), col("o_orderkey"))
      .withColumn("blk", ((col("rn") - 1) / 500).cast("long"))
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"),
        min(col("z")).as("z_min"), max(col("z")).as("z_max"))
      .orderBy(col("blk"))
  }

  val q65Sql: String =
    s"""WITH dims AS (
       |  SELECT o_orderkey,
       |    CAST(o_custkey % 256 AS INT) AS x,
       |    CAST(datediff('day', DATE '1992-01-01',
       |      CAST(o_orderdate AS DATE)) % 256 AS INT) AS y
       |  FROM orders),
       |zed AS (SELECT *, $zExprSql AS z FROM dims),
       |ranked AS (
       |  SELECT *, (ROW_NUMBER() OVER (ORDER BY z, o_orderkey) - 1) // 500
       |    AS blk FROM zed)
       |SELECT CAST(blk AS BIGINT) AS blk, COUNT(*) AS n_rows,
       |  min(x) AS x_min, max(x) AS x_max,
       |  min(y) AS y_min, max(y) AS y_max,
       |  min(z) AS z_min, max(z) AS z_max
       |FROM ranked GROUP BY blk ORDER BY blk""".stripMargin

  /** Robust outlier detection by median absolute deviation — the
    * data-quality screen that survives the contamination it hunts
    * (mean/stddev z-scores move WITH the outliers; medians don't).
    * The measure is exact integer cents with a keyed 10× inflation
    * injected on o_orderkey % 997 = 0 rows — the gate must flag
    * exactly the injected contamination, per priority group. Both
    * median and MAD are `percentile_disc(0.5)` — an exact order
    * statistic picked FROM the data (integer cents in, integer cents
    * out; no interpolated doubles), so the 3×MAD threshold compare is
    * pure BIGINT arithmetic on both engines.
    *
    * Plan: two grouped exact-percentile passes (median, then MAD of
    * deviations) + joins back on the 5-value group key — broadcast
    * both ways, the detail rows shuffle once per percentile. At
    * 100 TB exact percentiles per SMALL group key are fine (per-group
    * sort of that group's values); for high-cardinality keys the
    * approx_percentile sketch (q19) is the documented fallback. */
  def q67MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
          .multiply(when(col("o_orderkey") % 997 === 0, 10L).otherwise(1L))
          .as("cents"))
    val med = base.groupBy(col("o_orderpriority"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("bigint").as("med"))
    val dev = base.join(med, "o_orderpriority")
      .withColumn("ad", abs(col("cents") - col("med")))
    val mad = dev.groupBy(col("o_orderpriority"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)")
        .cast("bigint").as("mad"))
    dev.join(mad, "o_orderpriority")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        min(col("med")).as("med_cents"),
        min(col("mad")).as("mad_cents"),
        sum(when(col("ad") > lit(3L) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("o_orderpriority"))
  }

  val q67Sql: String =
    """WITH c AS (
      |  SELECT o_orderpriority, o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
      |      CASE WHEN o_orderkey % 997 = 0 THEN 10 ELSE 1 END AS cents
      |  FROM orders),
      |med AS (
      |  SELECT o_orderpriority, CAST(quantile_disc(cents, 0.5) AS BIGINT)
      |    AS med FROM c GROUP BY 1),
      |dev AS (
      |  SELECT c.o_orderpriority, c.cents, ABS(c.cents - m.med) AS ad
      |  FROM c JOIN med m USING (o_orderpriority)),
      |mad AS (
      |  SELECT o_orderpriority, CAST(quantile_disc(ad, 0.5) AS BIGINT)
      |    AS mad FROM dev GROUP BY 1)
      |SELECT d.o_orderpriority, COUNT(*) AS n,
      |  MIN(m2.med) AS med_cents, MIN(m3.mad) AS mad_cents,
      |  CAST(SUM(CASE WHEN d.ad > 3 * m3.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM dev d
      |JOIN med m2 USING (o_orderpriority)
      |JOIN mad m3 USING (o_orderpriority)
      |GROUP BY d.o_orderpriority ORDER BY d.o_orderpriority""".stripMargin

  /** Single-pass data-quality audit — the expectations report a
    * pipeline runs before publishing a batch (null counts, range and
    * freshness violations, natural-key uniqueness, FK orphans), as
    * ONE aggregation so the table is read once. The FK check rides a
    * broadcast left join to the customer dim inside the same pass; a
    * keyed perturbation (o_orderkey % 500 = 0 → custkey shifted out
    * of range) injects orphans the audit must count exactly — on
    * clean synthetic data every check passing proves nothing about
    * the checker. One row out; every metric an exact BIGINT.
    *
    * Scale: scan → broadcast join → single partial-aggregable pass;
    * the report costs one reduction regardless of corpus size. The
    * distinct natural-key count is the one non-mergeable term — at
    * 100 TB swap it for approx_count_distinct or a two-phase exact
    * count (documented trade; exact here since the gate is the
    * contract). */
  def q68DqAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .withColumn("fk_custkey",
        col("o_custkey") + when(col("o_orderkey") % 500 === 0, 1000000L)
          .otherwise(0L))
    val cust = t(spark, dir, "customer").select(col("c_custkey"))
    orders.join(broadcast(cust), col("fk_custkey") === col("c_custkey"),
        "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L))
          .as("n_null_status"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
          .as("n_fk_orphans"),
        sum(when(col("o_totalprice") < 0.0 || col("o_totalprice") > 450000.0,
          1L).otherwise(0L)).as("n_range_viol"),
        sum(when(col("o_orderdate") > to_timestamp(lit("2000-12-31")), 1L)
          .otherwise(0L)).as("n_stale_viol"),
        (count(lit(1)) -
          countDistinct(struct(col("o_custkey"), col("o_orderdate"))))
          .as("n_natkey_dups"))
  }

  val q68Sql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN o.o_orderstatus IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_null_status,
      |  CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_fk_orphans,
      |  CAST(SUM(CASE WHEN o.o_totalprice < 0.0 OR o.o_totalprice > 450000.0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_range_viol,
      |  CAST(SUM(CASE WHEN o.o_orderdate > TIMESTAMP '2000-12-31'
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_stale_viol,
      |  CAST(COUNT(*) - COUNT(DISTINCT (o.o_custkey, o.o_orderdate))
      |    AS BIGINT) AS n_natkey_dups
      |FROM (SELECT *, o_custkey +
      |        CASE WHEN o_orderkey % 500 = 0 THEN 1000000 ELSE 0 END
      |        AS fk_custkey FROM orders) o
      |LEFT JOIN customer c ON o.fk_custkey = c.c_custkey""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q63_scd2" -> ((q63Scd2 _, q63Sql)),
    "q64_histogram" -> ((q64Histogram _, q64Sql)),
    "q65_zorder_layout" -> ((q65ZorderLayout _, q65Sql)),
    "q67_mad_outliers" -> ((q67MadOutliers _, q67Sql)),
    "q68_dq_audit" -> ((q68DqAudit _, q68Sql)))
}
