package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third batch of relational-surface gates: ordered string
  * aggregation (LISTAGG), explicit GROUPING SETS, generator
  * functions, and the scalar string/regexp surface. */
object Relational3 {
  import Tables.t

  /** Ordered string aggregation: Spark 4's `LISTAGG ... WITHIN GROUP`
    * (ascending, descending-by-key, and DISTINCT forms) plus the
    * boolean aggregates `bool_and`/`bool_or`. String aggregation is
    * only deterministic with an explicit WITHIN GROUP ordering whose
    * key is unique per group (n_name / n_nationkey both are) — the
    * same contract DuckDB's `STRING_AGG(... ORDER BY ...)` carries,
    * so the two engines concatenate identically. Booleans cross as
    * BIGINT (0/1) to keep the hash compare type-stable. Scale: the
    * per-group concat state is bounded by group size; the plan is a
    * plain two-phase sort-agg on the group key. */
  def q43Listagg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "nation")
      .join(t(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
          .as("names_asc"),
        expr("listagg(n_name, '|') WITHIN GROUP (ORDER BY n_nationkey DESC)")
          .as("names_desc"),
        expr("listagg(DISTINCT substring(n_name, 1, 1), '') " +
          "WITHIN GROUP (ORDER BY substring(n_name, 1, 1))").as("initials"),
        expr("CAST(bool_and(n_nationkey % 2 = 0) AS BIGINT)").as("all_even"),
        expr("CAST(bool_or(n_nationkey % 7 = 0) AS BIGINT)").as("any_div7"),
        count(lit(1)).as("n"))
      .orderBy(col("r_name"))

  val q43Sql: String =
    """SELECT r_name,
      |  STRING_AGG(n_name, ',' ORDER BY n_name) AS names_asc,
      |  STRING_AGG(n_name, '|' ORDER BY n_nationkey DESC) AS names_desc,
      |  STRING_AGG(DISTINCT substring(n_name, 1, 1), ''
      |    ORDER BY substring(n_name, 1, 1)) AS initials,
      |  CAST(BOOL_AND(n_nationkey % 2 = 0) AS BIGINT) AS all_even,
      |  CAST(BOOL_OR(n_nationkey % 7 = 0) AS BIGINT) AS any_div7,
      |  COUNT(*) AS n
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Explicit GROUPING SETS with `grouping()` disambiguation — the
    * general form behind q10's ROLLUP and q13's CUBE, with a
    * hand-picked set list ((r,m),(r),(m),()) that neither shorthand
    * produces. The grouping-id is computed EXPLICITLY as
    * grouping(r)*2+grouping(m) on both engines rather than via
    * grouping_id()/GROUPING_ID() whose bit order is an engine choice;
    * the ORDER BY pins NULLS FIRST because the engines' ASC-null
    * defaults differ (Spark first, DuckDB last). Plan: Catalyst
    * expands to a single Expand + hash-agg — one shuffle on the
    * grouping key regardless of how many sets, which is why explicit
    * sets beat unioning four GROUP BYs at 100 TB (one scan, one
    * exchange instead of four). */
  def q44GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID.toString.replace("-", "")
    val cust = s"graft_gs_c_$suffix"
    val nat = s"graft_gs_n_$suffix"
    val reg = s"graft_gs_r_$suffix"
    t(spark, dir, "customer").createOrReplaceTempView(cust)
    t(spark, dir, "nation").createOrReplaceTempView(nat)
    t(spark, dir, "region").createOrReplaceTempView(reg)
    // spark.sql analyzes eagerly — views are inlined into the returned
    // plan and dropped before execution (the q31/q35 pattern)
    try spark.sql(
      s"""SELECT r_name, c_mktsegment,
         |  CAST(grouping(r_name) AS BIGINT) * 2 +
         |    CAST(grouping(c_mktsegment) AS BIGINT) AS gid,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         |FROM $cust
         |JOIN $nat ON c_nationkey = n_nationkey
         |JOIN $reg ON n_regionkey = r_regionkey
         |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name),
         |                        (c_mktsegment), ())
         |ORDER BY gid, r_name NULLS FIRST, c_mktsegment NULLS FIRST"""
        .stripMargin)
    finally {
      spark.catalog.dropTempView(cust)
      spark.catalog.dropTempView(nat)
      spark.catalog.dropTempView(reg)
    }
  }

  val q44Sql: String =
    """SELECT r_name, c_mktsegment,
      |  CAST(GROUPING(r_name) AS BIGINT) * 2 +
      |    CAST(GROUPING(c_mktsegment) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name),
      |                        (c_mktsegment), ())
      |ORDER BY gid, r_name NULLS FIRST, c_mktsegment NULLS FIRST"""
      .stripMargin

  /** Generator functions: a DESCENDING integer `sequence` exploded
    * with `posexplode` (position and value disagree, so the ordinal
    * contract is actually exercised), then per-element date
    * arithmetic off the anchor row (`date_add`, crossed as a
    * formatted string). The oracle reconstructs the ordinal from the
    * arithmetic identity pos = start − val that a step of −1
    * guarantees — if Spark's generator emitted elements in any other
    * order the hash breaks. Generators run row-local (Generate node,
    * no shuffle); the only exchange is the final presentation sort. */
  def q45Generators(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 50 === 7)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"),
        (col("o_orderkey") % 5 + 3).cast("int").as("start"))
      .select(col("o_orderkey"), col("od"),
        posexplode(sequence(col("start"), lit(1), lit(-1))))
      .select(col("o_orderkey"),
        col("pos").cast("bigint").as("pos"),
        col("col").cast("bigint").as("val"),
        date_format(date_add(col("od"), col("pos")), "yyyy-MM-dd").as("d"))
      .orderBy(col("o_orderkey"), col("pos"))

  val q45Sql: String =
    """WITH src AS (
      |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
      |    o_orderkey % 5 + 3 AS start
      |  FROM orders WHERE o_orderkey % 50 = 7),
      |seq AS (
      |  SELECT o_orderkey, od, start,
      |    UNNEST(generate_series(start, 1, -1)) AS val
      |  FROM src)
      |SELECT o_orderkey,
      |  CAST(start - val AS BIGINT) AS pos,
      |  CAST(val AS BIGINT) AS val,
      |  strftime(od + CAST(start - val AS INTEGER), '%Y-%m-%d') AS d
      |FROM seq ORDER BY o_orderkey, pos""".stripMargin

  /** Scalar string/regexp surface over real document text:
    * `regexp_extract` (first match, capture group), match counting
    * via `regexp_extract_all`, global `regexp_replace`,
    * `split_part`, `levenshtein`, `lpad`, `translate`. Every
    * function name and 1-based index convention is shared with
    * DuckDB; the one semantic trap is regexp_replace — Spark
    * replaces ALL matches, DuckDB only the first unless passed the
    * 'g' flag (pinned in the oracle). Patterns are escape-free ASCII
    * classes so the Java-regex vs RE2 dialect difference cannot
    * bite. All projections are per-row codegen'd — zero shuffle
    * until the final sort. */
  def q46StringFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        expr("CAST(size(regexp_extract_all(text, '[st][a-z]+', 0)) AS BIGINT)")
          .as("n_st_runs"),
        length(regexp_replace(col("text"), "[aeiou]", ""))
          .cast("bigint").as("len_novowel"),
        expr("split_part(text, ' ', 2)").as("second_token"),
        levenshtein(col("lang"), lit("en")).cast("bigint").as("lev_en"),
        lpad(col("lang"), 5, "_").as("lang_pad"),
        translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"))
      .orderBy(col("doc_id"))

  val q46Sql: String =
    """SELECT doc_id,
      |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
      |  CAST(len(regexp_extract_all(text, '[st][a-z]+')) AS BIGINT)
      |    AS n_st_runs,
      |  CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
      |    AS len_novowel,
      |  split_part(text, ' ', 2) AS second_token,
      |  CAST(levenshtein(lang, 'en') AS BIGINT) AS lev_en,
      |  lpad(lang, 5, '_') AS lang_pad,
      |  translate(lang, 'aeiou', 'AEIOU') AS lang_tr
      |FROM documents ORDER BY doc_id""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q43_listagg" -> ((q43Listagg _, q43Sql)),
    "q44_grouping_sets" -> ((q44GroupingSets _, q44Sql)),
    "q45_generators" -> ((q45Generators _, q45Sql)),
    "q46_string_fns" -> ((q46StringFns _, q46Sql)))
}
