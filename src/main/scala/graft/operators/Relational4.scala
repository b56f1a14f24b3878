package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth batch of relational-surface gates: null-skipping window
  * navigation, map higher-order functions, SQL table-valued
  * functions, and null-preserving generators. */
object Relational4 {
  import Tables.t

  /** Window navigation with null handling: `first_value`/`last_value`
    * /`nth_value` with IGNORE NULLS over a cumulative frame, plus
    * `lag`/`lead` with explicit defaults (the default fires only when
    * the offset leaves the partition — an in-window NULL value is
    * returned as NULL, a semantic both engines share but users
    * routinely get wrong). The nullable column is derived
    * deterministically (every third key). Engine syntax differs —
    * Spark puts IGNORE NULLS after the call, DuckDB inside it — but
    * the semantics were probed identical. Plan: one window over one
    * hash exchange on the 5-value priority key; at 100 TB the
    * partition-by key would need higher cardinality, which is a data
    * choice, not an operator limit. */
  def q52IgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val w = "PARTITION BY o_orderpriority ORDER BY o_orderkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 25 === 2)
      .select(col("o_orderpriority"), col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, lit(null).cast("bigint"))
          .otherwise(col("o_orderkey")).as("x"))
      .select(col("o_orderpriority"), col("o_orderkey"), col("x"),
        expr(s"first_value(x) IGNORE NULLS OVER ($w)").as("fv"),
        expr(s"last_value(x) IGNORE NULLS OVER ($w)").as("lv"),
        expr(s"nth_value(x, 2) IGNORE NULLS OVER ($w)").as("nv2"),
        expr("lag(x, 2, CAST(-1 AS BIGINT)) OVER " +
          "(PARTITION BY o_orderpriority ORDER BY o_orderkey)").as("lg2"),
        expr("lead(x, 1, CAST(-99 AS BIGINT)) OVER " +
          "(PARTITION BY o_orderpriority ORDER BY o_orderkey)").as("ld1"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val q52Sql: String =
    """SELECT o_orderpriority, o_orderkey,
      |  CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderkey END AS x,
      |  first_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |    ELSE o_orderkey END IGNORE NULLS) OVER w AS fv,
      |  last_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |    ELSE o_orderkey END IGNORE NULLS) OVER w AS lv,
      |  nth_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |    ELSE o_orderkey END, 2 IGNORE NULLS) OVER w AS nv2,
      |  lag(CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderkey END,
      |    2, CAST(-1 AS BIGINT)) OVER wp AS lg2,
      |  lead(CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderkey END,
      |    1, CAST(-99 AS BIGINT)) OVER wp AS ld1
      |FROM orders WHERE o_orderkey % 25 = 2
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wp AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Map higher-order functions: `transform_keys`,
    * `transform_values`, `map_filter`, and `map_zip_with` with
    * key-set asymmetry (the second map only carries types seen ≥3
    * times, so zip_with's outer-union NULL branch actually fires).
    * Maps are built from SORTED entry lists and re-sorted at
    * serialization (array_sort on the entry structs) so the crossed
    * string is layout-independent; DuckDB has no map HOFs, so the
    * oracle re-derives each serialized result from the per-type
    * aggregate — two independent computations of the same contract.
    * Plan: one groupBy(user, type) partial-agg shuffle, one
    * groupBy(user) — all map manipulation is per-row codegen after
    * aggregation. */
  def q53MapHof(spark: SparkSession, dir: String): DataFrame = {
    val ser = (m: String) => expr(
      s"""array_join(transform(array_sort(map_entries($m)),
         |  e -> concat(e.key, ':', CAST(e.value AS STRING))), ',')"""
        .stripMargin)
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("event_id")).as("mx"))
      .groupBy(col("user_id"))
      .agg(
        map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("n"))))).as("m"),
        map_from_entries(sort_array(collect_list(
          when(col("n") >= 3, struct(col("event_type"), col("mx"))))))
          .as("m2"))
      .select(col("user_id"),
        size(col("m")).cast("bigint").as("n_types"),
        size(col("m2")).cast("bigint").as("n_hot"),
        ser("transform_keys(m, (k, v) -> concat(k, '#'))").as("tk"),
        ser("transform_values(m, (k, v) -> v * CAST(10 AS BIGINT))")
          .as("tv"),
        ser("map_filter(m, (k, v) -> v % 2 = 0)").as("mf"),
        ser("""map_zip_with(m, m2, (k, a, b) ->
          coalesce(a, CAST(0 AS BIGINT)) * 1000 +
          coalesce(b, CAST(0 AS BIGINT)))""").as("mz"))
      .orderBy(col("user_id"))
  }

  val q53Sql: String =
    """WITH per AS (
      |  SELECT user_id, event_type, COUNT(*) AS n, MAX(event_id) AS mx
      |  FROM events GROUP BY user_id, event_type)
      |SELECT user_id,
      |  COUNT(*) AS n_types,
      |  COUNT(*) FILTER (WHERE n >= 3) AS n_hot,
      |  STRING_AGG(event_type || '#:' || CAST(n AS STRING), ','
      |    ORDER BY event_type) AS tk,
      |  STRING_AGG(event_type || ':' || CAST(n * 10 AS STRING), ','
      |    ORDER BY event_type) AS tv,
      |  -- Spark serializes an empty map_filter to '' (array_join over
      |  -- zero entries); a FILTERed STRING_AGG is NULL — coalesce.
      |  COALESCE(STRING_AGG(event_type || ':' || CAST(n AS STRING), ','
      |    ORDER BY event_type) FILTER (WHERE n % 2 = 0), '') AS mf,
      |  STRING_AGG(event_type || ':' ||
      |    CAST(n * 1000 + CASE WHEN n >= 3 THEN mx ELSE 0 END AS STRING),
      |    ',' ORDER BY event_type) AS mz
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  /** SQL table-valued function (Spark 4 `CREATE TEMPORARY FUNCTION
    * ... RETURNS TABLE`), invoked through a correlated LATERAL join —
    * the declarative "explode a per-row computed relation" shape.
    * Like scalar SQL UDFs the body inlines at analysis: the plan is
    * the same Generate-under-join Catalyst would produce for a
    * hand-written lateral explode, fully codegen'd. The oracle
    * UNNESTs generate_series directly. */
  def q54SqlUdtf(spark: SparkSession, dir: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID.toString.replace("-", "")
    val fn = s"graft_udtf_$suffix"
    spark.sql(
      s"""CREATE TEMPORARY FUNCTION $fn(n BIGINT)
         |RETURNS TABLE(x BIGINT, sq BIGINT)
         |RETURN SELECT x, x * x
         |FROM (SELECT explode(sequence(CAST(1 AS BIGINT), n)) AS x)"""
        .stripMargin)
    try {
      val ord = s"graft_udtf_o_$suffix"
      t(spark, dir, "orders").createOrReplaceTempView(ord)
      try spark.sql(
        s"""SELECT o.o_orderkey, t.x, t.sq
           |FROM $ord o, LATERAL $fn(o.o_orderkey % 4 + 1) t
           |WHERE o.o_orderkey % 60 = 5
           |ORDER BY o.o_orderkey, t.x""".stripMargin)
      finally spark.catalog.dropTempView(ord)
    } finally spark.sql(s"DROP TEMPORARY FUNCTION IF EXISTS $fn")
  }

  val q54Sql: String =
    """SELECT o_orderkey, CAST(x AS BIGINT) AS x,
      |  CAST(x * x AS BIGINT) AS sq
      |FROM orders, UNNEST(generate_series(1, o_orderkey % 4 + 1)) AS u(x)
      |WHERE o_orderkey % 60 = 5
      |ORDER BY o_orderkey, x""".stripMargin

  /** Null-preserving generators: `posexplode_outer` keeps the source
    * row (NULL pos/token) when the exploded array is empty — the
    * LEFT-JOIN-shaped explode a curation pipeline needs when
    * documents without matches must survive (an inner explode would
    * silently drop 20% of the corpus here). DuckDB has no outer
    * unnest; the oracle unions the inner unnest with the empty-array
    * rows. Generate is row-local; the only exchange is the
    * presentation sort. */
  def q55ExplodeOuter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> length(w) >= 8)").as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("bigint").as("n_long"),
        posexplode_outer(col("arr")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("n_long"),
        col("pos").cast("bigint").as("pos"), col("tok"))
      .orderBy(col("doc_id"), col("pos"))

  val q55Sql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> length(w) >= 8) AS arr
      |  FROM documents)
      |SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_long,
      |  CAST(i - 1 AS BIGINT) AS pos, arr[i] AS tok
      |FROM base, UNNEST(generate_series(1, len(arr))) AS u(i)
      |UNION ALL
      |SELECT doc_id, 0, NULL, NULL FROM base WHERE len(arr) = 0
      |ORDER BY doc_id, pos""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q52_ignore_nulls" -> ((q52IgnoreNulls _, q52Sql)),
    "q53_map_hof" -> ((q53MapHof _, q53Sql)),
    "q54_sql_udtf" -> ((q54SqlUdtf _, q54Sql)),
    "q55_explode_outer" -> ((q55ExplodeOuter _, q55Sql)))
}
