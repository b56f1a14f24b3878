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
      |-- Spark emits NO rows for any grouping set over EMPTY input
      |-- (grouping-id becomes a grouping key), where the standard —
      |-- and DuckDB — emit one () grand-total row with n=0. Guard the
      |-- oracle to Spark's shape; on any nonempty input every group
      |-- has n >= 1 and this clause is a no-op (r9 fuzz).
      |HAVING COUNT(*) > 0
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
        // ASCII-projected operand: Spark's levenshtein counts CODE
        // POINTS where DuckDB's counts BYTES, so multibyte chars give
        // different distances ("中"→"en": 2 vs 3). Folding non-ASCII
        // to '?' (1 char = 1 byte) makes the metric engine-portable;
        // a no-op on ASCII language tags (r9 fuzz).
        levenshtein(regexp_replace(col("lang"), "[^\\x00-\\x7F]", "?"),
          lit("en")).cast("bigint").as("lev_en"),
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
      |  CAST(levenshtein(
      |    regexp_replace(lang, '[^\x00-\x7f]', '?', 'g'), 'en')
      |    AS BIGINT) AS lev_en,
      |  lpad(lang, 5, '_') AS lang_pad,
      |  translate(lang, 'aeiou', 'AEIOU') AS lang_tr
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Scalar subqueries — correlated aggregates in the SELECT list,
    * an uncorrelated scalar in WHERE, and an EXISTS predicate, all in
    * one statement. Catalyst decorrelates each scalar subquery into a
    * left-outer aggregate join and the EXISTS into a left-semi join —
    * the 100 TB story is that a "per-row lookup" in the SQL text
    * never executes per-row: it becomes one aggregate per subquery
    * (grouped on the correlation key) plus joins on n_nationkey, and
    * nation-sized build sides broadcast. The same SQL text runs on
    * both engines (q44 temp-view pattern). All outputs are exact
    * BIGINTs. */
  def q47ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID.toString.replace("-", "")
    val nat = s"graft_ssq_n_$suffix"
    val sup = s"graft_ssq_s_$suffix"
    val cus = s"graft_ssq_c_$suffix"
    t(spark, dir, "nation").createOrReplaceTempView(nat)
    t(spark, dir, "supplier").createOrReplaceTempView(sup)
    t(spark, dir, "customer").createOrReplaceTempView(cus)
    try spark.sql(
      s"""SELECT n_name, CAST(n_nationkey AS BIGINT) AS nk,
         |  (SELECT COUNT(*) FROM $sup WHERE s_nationkey = n_nationkey)
         |    AS n_supp,
         |  (SELECT MAX(c_custkey) FROM $cus WHERE c_nationkey = n_nationkey)
         |    AS max_cust,
         |  (SELECT COUNT(*) FROM $cus WHERE c_nationkey = n_nationkey
         |     AND c_mktsegment = 'BUILDING') AS n_building
         |FROM $nat
         |WHERE n_nationkey >= (SELECT MIN(s_nationkey) FROM $sup)
         |  AND EXISTS (SELECT 1 FROM $cus WHERE c_nationkey = n_nationkey)
         |ORDER BY nk""".stripMargin)
    finally {
      spark.catalog.dropTempView(nat)
      spark.catalog.dropTempView(sup)
      spark.catalog.dropTempView(cus)
    }
  }

  val q47Sql: String =
    """SELECT n_name, CAST(n_nationkey AS BIGINT) AS nk,
      |  (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey)
      |    AS n_supp,
      |  (SELECT MAX(c_custkey) FROM customer WHERE c_nationkey = n_nationkey)
      |    AS max_cust,
      |  (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey
      |     AND c_mktsegment = 'BUILDING') AS n_building
      |FROM nation
      |WHERE n_nationkey >= (SELECT MIN(s_nationkey) FROM supplier)
      |  AND EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
      |ORDER BY nk""".stripMargin

  /** Bitwise surface: shifts, AND/OR/XOR, `bit_count`, and the
    * bitwise AGGREGATES `bit_and`/`bit_or`/`bit_xor` (Spark 3.3+,
    * same names in DuckDB). Dialect traps pinned in the oracle:
    * DuckDB's `^` is POWER (its xor is `xor(a,b)`), and shifts are
    * operators (`<<`) where Spark's are functions (`shiftleft`).
    * Everything is exact integer arithmetic — the aggregates are
    * commutative/associative so partition layout cannot perturb
    * them, and the whole pipeline is one map-side-combined
    * hash-aggregate shuffle on the 21-value composite key. */
  def q48Bitwise(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        (col("l_orderkey") % 3).as("bucket"),
        (shiftleft(col("l_linenumber").cast("bigint"), 4)
          .bitwiseOR(col("l_orderkey").bitwiseAND(lit(15L)))).as("packed"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("xo"),
        bit_count(col("l_orderkey")).cast("bigint").as("bc"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(expr("bit_and(packed)").as("band"),
        expr("bit_or(packed)").as("bor"),
        expr("bit_xor(xo)").as("bxor"),
        sum(col("bc")).as("sum_bits"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("bucket"))

  val q48Sql: String =
    """SELECT l_returnflag, l_orderkey % 3 AS bucket,
      |  BIT_AND((l_linenumber::BIGINT << 4) | (l_orderkey & 15)) AS band,
      |  BIT_OR((l_linenumber::BIGINT << 4) | (l_orderkey & 15)) AS bor,
      |  BIT_XOR(xor(l_orderkey, l_partkey)) AS bxor,
      |  CAST(SUM(bit_count(l_orderkey)) AS BIGINT) AS sum_bits,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag, bucket
      |ORDER BY l_returnflag, bucket""".stripMargin

  /** Calendar arithmetic: `add_months` (with the end-of-month clamp —
    * DuckDB's month-interval addition clamps identically),
    * `last_day`, `months_between` restricted to month-truncated
    * operands where it is provably integral (the fractional case is
    * a Spark-specific /31 convention no other engine shares),
    * `quarter`, day-granularity `datediff`, and `make_date`. Dates
    * cross as formatted strings; every projection is row-local
    * codegen, the only exchange is the presentation sort. */
  def q49DateArith(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 40 === 1)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"),
        (col("o_orderkey") % 7 + 1).cast("int").as("nm"))
      .select(col("o_orderkey"),
        date_format(add_months(col("od"), col("nm")), "yyyy-MM-dd").as("am"),
        date_format(last_day(col("od")), "yyyy-MM-dd").as("ld"),
        months_between(date_trunc("MONTH", col("od")),
          lit("1995-01-01").cast("date")).cast("bigint").as("mb"),
        quarter(col("od")).cast("bigint").as("q"),
        datediff(col("od"), make_date(lit(1995), lit(1), lit(1)))
          .cast("bigint").as("dd"))
      .orderBy(col("o_orderkey"))

  val q49Sql: String =
    """SELECT o_orderkey,
      |  strftime(CAST(o_orderdate AS DATE)
      |    + to_months(CAST(o_orderkey % 7 + 1 AS INTEGER)), '%Y-%m-%d') AS am,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS ld,
      |  CAST(date_diff('month', DATE '1995-01-01',
      |    date_trunc('month', CAST(o_orderdate AS DATE))) AS BIGINT) AS mb,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |  CAST(date_diff('day', DATE '1995-01-01',
      |    CAST(o_orderdate AS DATE)) AS BIGINT) AS dd
      |FROM orders WHERE o_orderkey % 40 = 1
      |ORDER BY o_orderkey""".stripMargin

  /** Recursive CTE (Spark 4's `WITH RECURSIVE`) — a data-driven
    * linked-list walk: each region's nations are chained by
    * next-higher key, and the recursion follows the chain from the
    * region's minimum nation accumulating depth and a path string.
    * Identical SQL text runs on both engines; the recursion depth is
    * data-dependent (nations per region), not a literal. Spark
    * executes this as iterated UnionLoop steps — each iteration is a
    * distributed join of the frontier against the (broadcastable)
    * edge list, the same frontier-expansion shape as
    * `graph_reachability`'s hand-unrolled fixpoint, but expressed in
    * one declarative statement. */
  def q50RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID.toString.replace("-", "")
    val nat = s"graft_rc_n_$suffix"
    t(spark, dir, "nation").createOrReplaceTempView(nat)
    try spark.sql(
      s"""WITH RECURSIVE nxt AS (
         |  SELECT n1.n_regionkey AS rk, n1.n_nationkey AS src,
         |         MIN(n2.n_nationkey) AS dst
         |  FROM $nat n1 JOIN $nat n2
         |    ON n1.n_regionkey = n2.n_regionkey
         |   AND n2.n_nationkey > n1.n_nationkey
         |  GROUP BY n1.n_regionkey, n1.n_nationkey),
         |roots AS (
         |  SELECT n_regionkey AS rk, MIN(n_nationkey) AS nk
         |  FROM $nat GROUP BY n_regionkey),
         |walk(rk, nk, depth, path) AS (
         |  SELECT rk, nk, CAST(1 AS BIGINT), CAST(nk AS STRING) FROM roots
         |  UNION ALL
         |  SELECT w.rk, x.dst, w.depth + CAST(1 AS BIGINT),
         |         w.path || '->' || CAST(x.dst AS STRING)
         |  FROM walk w JOIN nxt x ON x.rk = w.rk AND x.src = w.nk)
         |SELECT CAST(rk AS BIGINT) AS rk, CAST(nk AS BIGINT) AS nk,
         |       depth, path
         |FROM walk ORDER BY rk, depth""".stripMargin)
    finally spark.catalog.dropTempView(nat)
  }

  val q50Sql: String =
    """WITH RECURSIVE nxt AS (
      |  SELECT n1.n_regionkey AS rk, n1.n_nationkey AS src,
      |         MIN(n2.n_nationkey) AS dst
      |  FROM nation n1 JOIN nation n2
      |    ON n1.n_regionkey = n2.n_regionkey
      |   AND n2.n_nationkey > n1.n_nationkey
      |  GROUP BY n1.n_regionkey, n1.n_nationkey),
      |roots AS (
      |  SELECT n_regionkey AS rk, MIN(n_nationkey) AS nk
      |  FROM nation GROUP BY n_regionkey),
      |walk(rk, nk, depth, path) AS (
      |  SELECT rk, nk, CAST(1 AS BIGINT), CAST(nk AS STRING) FROM roots
      |  UNION ALL
      |  SELECT w.rk, x.dst, w.depth + CAST(1 AS BIGINT),
      |         w.path || '->' || CAST(x.dst AS STRING)
      |  FROM walk w JOIN nxt x ON x.rk = w.rk AND x.src = w.nk)
      |SELECT CAST(rk AS BIGINT) AS rk, CAST(nk AS BIGINT) AS nk,
      |       depth, path
      |FROM walk ORDER BY rk, depth""".stripMargin

  /** SQL-defined functions (Spark 4 `CREATE TEMPORARY FUNCTION ...
    * RETURN <expr>`): one BIGINT and one STRING scalar UDF created,
    * applied, and dropped inside the gate. Because the body is SQL,
    * Catalyst INLINES it at analysis — the plan is identical to
    * writing the expression by hand (fully codegen'd, pushdown-able),
    * which is exactly why SQL UDFs are the 100 TB answer where a
    * Scala closure UDF would be an optimization barrier. The oracle
    * states the inlined expressions directly — the same rewrite the
    * analyzer performs. */
  def q51SqlUdf(spark: SparkSession, dir: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID.toString.replace("-", "")
    val fScore = s"graft_udf_score_$suffix"
    val fTag = s"graft_udf_tag_$suffix"
    spark.sql(s"CREATE TEMPORARY FUNCTION $fScore(x BIGINT, y BIGINT) " +
      "RETURNS BIGINT RETURN x * 100 + y % 97")
    spark.sql(s"CREATE TEMPORARY FUNCTION $fTag(s STRING) RETURNS STRING " +
      "RETURN concat(upper(substring(s, 1, 2)), '-', " +
      "CAST(length(s) AS STRING))")
    try {
      val cust = s"graft_udf_c_$suffix"
      t(spark, dir, "customer").createOrReplaceTempView(cust)
      try spark.sql(
        s"""SELECT c_custkey, $fScore(c_custkey, c_nationkey) AS score,
           |  $fTag(c_mktsegment) AS seg_tag
           |FROM $cust WHERE c_custkey % 25 = 3
           |ORDER BY c_custkey""".stripMargin)
      finally spark.catalog.dropTempView(cust)
    } finally {
      spark.sql(s"DROP TEMPORARY FUNCTION IF EXISTS $fScore")
      spark.sql(s"DROP TEMPORARY FUNCTION IF EXISTS $fTag")
    }
  }

  val q51Sql: String =
    """SELECT c_custkey, c_custkey * 100 + c_nationkey % 97 AS score,
      |  upper(substring(c_mktsegment, 1, 2)) || '-' ||
      |    CAST(length(c_mktsegment) AS STRING) AS seg_tag
      |FROM customer WHERE c_custkey % 25 = 3
      |ORDER BY c_custkey""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q43_listagg" -> ((q43Listagg _, q43Sql)),
    "q44_grouping_sets" -> ((q44GroupingSets _, q44Sql)),
    "q45_generators" -> ((q45Generators _, q45Sql)),
    "q46_string_fns" -> ((q46StringFns _, q46Sql)),
    "q47_scalar_subquery" -> ((q47ScalarSubquery _, q47Sql)),
    "q48_bitwise" -> ((q48Bitwise _, q48Sql)),
    "q49_date_arith" -> ((q49DateArith _, q49Sql)),
    "q50_recursive_cte" -> ((q50RecursiveCte _, q50Sql)),
    "q51_sql_udf" -> ((q51SqlUdf _, q51Sql)))
}
