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
        // b (= max event_id) rides in MOD 1000: int64-edge ids would
        // overflow a*1000+b — DuckDB errors, Spark wraps (r9 fuzz)
        ser("""map_zip_with(m, m2, (k, a, b) ->
          coalesce(a, CAST(0 AS BIGINT)) * 1000 +
          coalesce(b, CAST(0 AS BIGINT)) % 1000)""").as("mz"))
      .orderBy(col("user_id"))
  }

  val q53Sql: String =
    """WITH per AS (
      |  SELECT user_id, event_type, COUNT(*) AS n, MAX(event_id) AS mx
      |  FROM events GROUP BY user_id, event_type)
      |SELECT user_id,
      |  COUNT(*) AS n_types,
      |  COUNT(*) FILTER (WHERE n >= 3) AS n_hot,
      |  -- tk sorts by the TRANSFORMED key (type || '#'): appending
      |  -- '#' (0x23) reorders '' vs ' 42 ' since '#' > ' ' (r9 fuzz)
      |  STRING_AGG(event_type || '#:' || CAST(n AS STRING), ','
      |    ORDER BY event_type || '#') AS tk,
      |  STRING_AGG(event_type || ':' || CAST(n * 10 AS STRING), ','
      |    ORDER BY event_type) AS tv,
      |  -- Spark serializes an empty map_filter to '' (array_join over
      |  -- zero entries); a FILTERed STRING_AGG is NULL — coalesce.
      |  COALESCE(STRING_AGG(event_type || ':' || CAST(n AS STRING), ','
      |    ORDER BY event_type) FILTER (WHERE n % 2 = 0), '') AS mf,
      |  STRING_AGG(event_type || ':' ||
      |    CAST(n * 1000 + CASE WHEN n >= 3 THEN mx % 1000 ELSE 0 END
      |      AS STRING),
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

  /** ANSI ordered-set aggregates: `percentile_cont` / `percentile_disc
    * ... WITHIN GROUP` and `median` (distinct from q19's Spark-native
    * `percentile`/`approx_percentile`). Cross-engine float parity is
    * safe by construction: quantities are small integers stored as
    * DOUBLE and the probed fractions are quarters, so the
    * interpolation position p·(n−1) and the lerp (b−a)·f are both
    * exact binary — Spark's (1−f)·a + f·b and DuckDB's a + (b−a)·f
    * agree bit-for-bit. The oracle CASTs to DOUBLE explicitly
    * because DuckDB would otherwise type the quantile DECIMAL and
    * round it. Plan: one two-phase sort-agg shuffle on the 6-value
    * composite key. */
  def q56Percentile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)")
          .as("pc25"),
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)")
          .as("pc50"),
        expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)")
          .as("pc75"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)")
          .as("pd25"),
        expr("median(l_quantity)").as("med"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q56Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS pc25,
      |  quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS pc50,
      |  quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS pc75,
      |  quantile_disc(CAST(l_quantity AS DOUBLE), 0.25) AS pd25,
      |  median(CAST(l_quantity AS DOUBLE)) AS med,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Bag (multiset) set operations — `intersectAll` / `exceptAll`
    * keep MULTIPLICITY (min / difference of per-key counts), which
    * q9's distinct set ops erase, plus `unionByName(allowMissing
    * Columns)` — the schema-evolution union that matches by NAME
    * where SQL UNION matches by position. Catalyst plans the ALL
    * variants as a count-per-key aggregate + generate (replicate),
    * NOT a join — one shuffle each, no multiplicity blowup. Results
    * are aggregated to per-op summary rows so the gate stays
    * compact. */
  def q57SetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "orders").filter(col("o_orderkey") % 2 === 0)
      .select(col("o_custkey"))
    val b = t(spark, dir, "orders").filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey"))
    def summarize(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_keys"),
        sum(col("o_custkey")).as("sum_keys"))
        .select(lit(label).as("op"), col("n"), col("n_keys"),
          col("sum_keys"), lit(null).cast("bigint").as("extra"))
    // unionByName: same columns permuted + one missing, matched by
    // name (positional UNION would scramble them)
    val u1 = t(spark, dir, "nation")
      .select(col("n_nationkey").cast("bigint").as("k"),
        col("n_regionkey").cast("bigint").as("r"),
        col("n_nationkey").cast("bigint").as("extra"))
    val u2 = t(spark, dir, "nation")
      .select((col("n_regionkey") * 100).cast("bigint").as("r"),
        (col("n_nationkey") + 1000).cast("bigint").as("k"))
    val byName = u1.unionByName(u2, allowMissingColumns = true)
      .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("n_keys"),
        sum(col("r")).as("sum_keys"), sum(col("extra")).as("extra"))
      .select(lit("union_by_name").as("op"), col("n"), col("n_keys"),
        col("sum_keys"), col("extra"))
    summarize("intersect_all", a.intersectAll(b))
      .unionAll(summarize("except_all", a.exceptAll(b)))
      .unionAll(byName)
      .orderBy(col("op"))
  }

  val q57Sql: String =
    """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0),
      |b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0),
      |ia AS (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b),
      |ea AS (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b),
      |ub AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS k,
      |    CAST(n_regionkey AS BIGINT) AS r,
      |    CAST(n_nationkey AS BIGINT) AS extra FROM nation
      |  UNION ALL
      |  SELECT CAST(n_nationkey + 1000 AS BIGINT),
      |    CAST(n_regionkey * 100 AS BIGINT), NULL FROM nation)
      |SELECT 'except_all' AS op, COUNT(*) AS n,
      |  COUNT(DISTINCT o_custkey) AS n_keys,
      |  CAST(SUM(o_custkey) AS BIGINT) AS sum_keys,
      |  CAST(NULL AS BIGINT) AS extra FROM ea
      |UNION ALL
      |SELECT 'intersect_all', COUNT(*), COUNT(DISTINCT o_custkey),
      |  CAST(SUM(o_custkey) AS BIGINT), CAST(NULL AS BIGINT) FROM ia
      |UNION ALL
      |SELECT 'union_by_name', COUNT(*), COUNT(DISTINCT k),
      |  CAST(SUM(r) AS BIGINT), CAST(SUM(extra) AS BIGINT) FROM ub
      |ORDER BY op""".stripMargin

  /** CSV and delimited-map scalar functions: `to_csv` renders a
    * struct, `from_csv` parses it back with a declared schema (the
    * full render→parse roundtrip is exercised — any quoting or
    * schema-inference drift breaks the extracted fields), and
    * `str_to_map` parses a delimited key:value string. DuckDB has no
    * from_csv/str_to_map; the oracle states the identities the
    * roundtrip must preserve, computed from the base columns. All
    * per-row codegen, zero shuffle before the sort. */
  def q58CsvMap(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 30 === 4)
      .select(col("o_orderkey"),
        // the writer-side whitespace trim is OFF: to_csv's write
        // defaults set ignore{Leading,Trailing}WhiteSpace=true (unlike
        // the read side), silently rewriting values like "1-URGENT "
        // → "1-URGENT" while the oracle concatenates the raw column
        // (r10 fuzz find on trailing-space priorities)
        expr("to_csv(named_struct('k', o_orderkey, 'st', o_orderstatus, " +
          "'pr', o_orderpriority), map('ignoreLeadingWhiteSpace', 'false', " +
          "'ignoreTrailingWhiteSpace', 'false'))").as("line"),
        expr("str_to_map(concat('st:', o_orderstatus, '|pr:', " +
          "o_orderpriority), '\\\\|', ':')").as("mp"))
      .select(col("o_orderkey"), col("line"),
        expr("from_csv(line, 'k BIGINT, st STRING, pr STRING')").as("r"),
        col("mp"))
      .select(col("o_orderkey"), col("line"),
        col("r.k").as("rk"), col("r.st").as("rst"), col("r.pr").as("rpr"),
        expr("element_at(mp, 'st')").as("m_st"),
        size(col("mp")).cast("bigint").as("m_n"))
      .orderBy(col("o_orderkey"))

  val q58Sql: String =
    """SELECT o_orderkey,
      |  -- to_csv renders an EMPTY string field as a quoted "" (to
      |  -- distinguish it from NULL); mirror that quoting (r9 fuzz)
      |  CAST(o_orderkey AS STRING) || ',' ||
      |    CASE WHEN o_orderstatus = '' THEN '""' ELSE o_orderstatus END
      |    || ',' ||
      |    CASE WHEN o_orderpriority = '' THEN '""' ELSE o_orderpriority END
      |    AS line,
      |  -- ...and from_csv parses that quoted empty field back to
      |  -- NULL (the CSV reader's nullValue default) — NULLIF mirrors
      |  o_orderkey AS rk, NULLIF(o_orderstatus, '') AS rst,
      |  NULLIF(o_orderpriority, '') AS rpr,
      |  o_orderstatus AS m_st, CAST(2 AS BIGINT) AS m_n
      |FROM orders WHERE o_orderkey % 30 = 4
      |ORDER BY o_orderkey""".stripMargin

  /** Time-based window frames: `RANGE BETWEEN INTERVAL 30 DAYS
    * PRECEDING AND CURRENT ROW` over the order timestamp — the
    * value-range frame where q28's numeric RANGE and q5's ROWS
    * frames don't reach. RANGE includes peer rows (equal
    * timestamps) on both engines; the summed measure is exact cents
    * (BIGINT) so in-frame summation order cannot matter. One window
    * exchange on the 5-value priority key. */
  def q59IntervalFrame(spark: SparkSession, dir: String): DataFrame = {
    val frame = "PARTITION BY o_orderpriority ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW"
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 15 === 3)
      .select(col("o_orderpriority"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        col("o_orderdate").as("ts"),
        col("o_totalprice").cast("decimal(18,2)").multiply(100)
          .cast("bigint").as("cents"))
      .select(col("o_orderpriority"), col("o_orderkey"), col("od"),
        expr(s"COUNT(*) OVER ($frame)").as("n_30d"),
        expr(s"SUM(cents) OVER ($frame)").as("cents_30d"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val q59Sql: String =
    """SELECT o_orderpriority, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS od,
      |  COUNT(*) OVER w AS n_30d,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    OVER w AS BIGINT) AS cents_30d
      |FROM orders WHERE o_orderkey % 15 = 3
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
      |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Parameterized SQL (Spark 3.4+ named parameter markers): the
    * statement text carries `:lo` / `:hi` / `:seg` and values arrive
    * through the args map — the injection-safe API a query service
    * builds on. Parameters bind as literals BEFORE optimization, so
    * pushdown/pruning see constants (same plan as hand-inlined
    * literals — which is exactly what the oracle states). */
  def q60ParamQuery(spark: SparkSession, dir: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID.toString.replace("-", "")
    val cus = s"graft_pq_c_$suffix"
    t(spark, dir, "customer").createOrReplaceTempView(cus)
    try spark.sql(
      s"""SELECT c_mktsegment, COUNT(*) AS n,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
         |FROM $cus
         |WHERE c_custkey >= :lo AND c_custkey < :hi
         |  AND c_mktsegment <> :seg
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      Map("lo" -> 100, "hi" -> 900, "seg" -> "MACHINERY"))
    finally spark.catalog.dropTempView(cus)
  }

  val q60Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer
      |WHERE c_custkey >= 100 AND c_custkey < 900
      |  AND c_mktsegment <> 'MACHINERY'
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Comparator-lambda `array_sort`: the two-argument comparator form
    * ordering distinct document words by (length, word) — an order no
    * natural sort produces (probed: differs from lexicographic on
    * this corpus). The oracle has no comparator lambdas; it builds
    * the same order from a sortable struct key (list_transform →
    * list_sort → project), so the comparator's contract is checked
    * against an independent encoding of the same order. Row-local
    * projection; the md5 certifies the full sorted sequence. */
  def q61ComparatorSort(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        expr("""array_sort(array_distinct(split(text, ' ')),
          (l, r) -> CASE WHEN length(l) < length(r) THEN -1
                         WHEN length(l) > length(r) THEN 1
                         WHEN l < r THEN -1 WHEN l > r THEN 1
                         ELSE 0 END)""").as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("bigint").as("n_distinct"),
        element_at(col("ws"), 1).as("shortest_first"),
        element_at(col("ws"), -1).as("longest_last"),
        md5(array_join(col("ws"), "|")).as("order_md5"))
      .orderBy(col("doc_id"))

  val q61Sql: String =
    """SELECT doc_id,
      |  CAST(len(ws) AS BIGINT) AS n_distinct,
      |  ws[1] AS shortest_first,
      |  ws[-1] AS longest_last,
      |  md5(list_aggregate(ws, 'string_agg', '|')) AS order_md5
      |FROM (
      |  SELECT doc_id, list_transform(list_sort(list_transform(
      |    list_distinct(string_split(text, ' ')),
      |    w -> {'k1': length(w), 'k2': w})), s -> s.k2) AS ws
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Struct (ROW) ordering semantics: `min`/`max` over a struct
    * compare lexicographically field by field — the argmin-by-
    * composite-key idiom (min(struct(price, key)) = "cheapest order,
    * ties to lowest key") that replaces a self-join or window where
    * only one extreme row per group is needed. Exact cents make the
    * comparison integer. One map-side-combined agg shuffle on the
    * 15-value composite key — at 100 TB this is the cheapest argmin
    * there is (no window sort, no join). */
  def q62StructOps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").multiply(100)
          .cast("bigint").as("cents"), col("o_orderkey"))
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("cents"), col("o_orderkey"))).as("lo"),
        max(struct(col("cents"), col("o_orderkey"))).as("hi"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
        col("lo.cents").as("min_cents"), col("lo.o_orderkey").as("min_key"),
        col("hi.cents").as("max_cents"), col("hi.o_orderkey").as("max_key"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  val q62Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  (min({'c': cents, 'k': o_orderkey})).c AS min_cents,
      |  (min({'c': cents, 'k': o_orderkey})).k AS min_key,
      |  (max({'c': cents, 'k': o_orderkey})).c AS max_cents,
      |  (max({'c': cents, 'k': o_orderkey})).k AS max_key
      |FROM (SELECT o_orderstatus, o_orderpriority, o_orderkey,
      |        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |          AS cents FROM orders)
      |GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** XML surface (Spark 4 `to_xml`/`from_xml` + the xpath extractor
    * family): serialize a struct per order, parse it back against a
    * declared schema, and extract the same fields a third way via
    * XPath (`xpath_long`/`xpath_string`) — three independent paths
    * that must agree. The serialized document ALSO crosses verbatim:
    * to_xml's layout (ROW root, 4-space indent, one field per line)
    * is a stable contract, and the DuckDB oracle — which has no XML
    * type — reconstructs the byte-identical string from base columns
    * with chr(10) concatenation, so an upstream formatting change
    * surfaces as a hash break instead of silent drift. All per-row
    * codegen'd projections, zero shuffle before the final sort.
    *
    * Input totalization (r9): XML 1.0 cannot represent control chars
    * at all (in any escaping), and `&`/`<`/`>` would diverge between
    * to_xml's entity escaping and the oracle's raw concat — so both
    * sides strip exactly that class first. This is the policy a
    * production XML exporter must define anyway; on the driver
    * fixtures (plain priorities/statuses) the strip is a no-op. */
  def q66Xml(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 30 === 11)
      // Parallelism floor (opt r13, guide §2.5): the one-file scan is a
      // single partition, serializing the triple XML round trip
      // (to_xml → from_xml + 3 XPath evaluations per row) on one core.
      // Same-cardinality map work — narrow pre-XML rows shuffle once,
      // width derived from the cluster. Aggregation gates deliberately
      // do NOT get this treatment (a raw-row shuffle would defeat
      // partial aggregation); this gate has no aggregate. Conditional
      // since opt r14 (Tables.floorByKey): no-op on wide scans.
      .transform(Tables.floorByKey(_, col("o_orderkey")))
      .withColumn("o_orderstatus",
        regexp_replace(col("o_orderstatus"), "[\\x00-\\x1f&<>]", ""))
      .withColumn("o_orderpriority",
        regexp_replace(col("o_orderpriority"), "[\\x00-\\x1f&<>]", ""))
      .select(col("o_orderkey"),
        expr("to_xml(named_struct('k', o_orderkey, 'st', o_orderstatus, " +
          "'pr', o_orderpriority))").as("doc"))
      .select(col("o_orderkey"), col("doc"),
        expr("from_xml(doc, 'k BIGINT, st STRING, pr STRING')").as("r"),
        expr("xpath_long(doc, '/ROW/k')").as("xk"),
        expr("xpath_string(doc, '/ROW/st')").as("xst"),
        expr("xpath_string(doc, '/ROW/pr')").as("xpr"))
      .select(col("o_orderkey"), col("doc"),
        col("r.k").as("rk"), col("r.st").as("rst"), col("r.pr").as("rpr"),
        col("xk"), col("xst"), col("xpr"))
      .orderBy(col("o_orderkey"))

  val q66Sql: String =
    """WITH src AS (
      |  SELECT o_orderkey,
      |    regexp_replace(o_orderstatus, '[\x00-\x1f&<>]', '', 'g') AS st,
      |    regexp_replace(o_orderpriority, '[\x00-\x1f&<>]', '', 'g') AS pr
      |  FROM orders WHERE o_orderkey % 30 = 11)
      |SELECT o_orderkey,
      |  '<ROW>' || chr(10) ||
      |  '    <k>' || CAST(o_orderkey AS VARCHAR) || '</k>' || chr(10) ||
      |  '    <st>' || st || '</st>' || chr(10) ||
      |  '    <pr>' || pr || '</pr>' || chr(10) ||
      |  '</ROW>' AS doc,
      |  o_orderkey AS rk, st AS rst, pr AS rpr,
      |  o_orderkey AS xk, st AS xst, pr AS xpr
      |FROM src ORDER BY o_orderkey""".stripMargin

  /** Dynamic SQL (Spark 4 `EXECUTE IMMEDIATE` with `USING` binds and
    * the `IDENTIFIER()` clause): the statement text lives in a
    * session variable, the table name arrives as a BOUND PARAMETER
    * routed through IDENTIFIER() — the injection-safe way to template
    * over object names, where q60 templates over values (a name can't
    * be a `:param` literal; IDENTIFIER is the analyzer's typed hole
    * for it). The inner query is the same aggregate q60's oracle
    * states, so the dynamic path must plan and execute identically to
    * the static text. Session variables are dropped in finally —
    * they are session-global, unlike temp views they have no
    * namespace suffix discipline to lean on. */
  def q69ExecImmediate(spark: SparkSession, dir: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID.toString.replace("-", "")
    val cus = s"graft_ei_c_$suffix"
    t(spark, dir, "customer").createOrReplaceTempView(cus)
    try {
      spark.sql("DECLARE VARIABLE graft_ei_stmt STRING")
      try {
        spark.sql(
          """SET VARIABLE graft_ei_stmt =
            |  'SELECT c_mktsegment, COUNT(*) AS n,
            |     CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
            |   FROM IDENTIFIER(?) WHERE c_custkey % 3 = ?
            |   GROUP BY c_mktsegment ORDER BY c_mktsegment'""".stripMargin)
        spark.sql(s"EXECUTE IMMEDIATE graft_ei_stmt USING '$cus', 1")
      } finally spark.sql("DROP TEMPORARY VARIABLE graft_ei_stmt")
    } finally spark.catalog.dropTempView(cus)
  }

  val q69Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer WHERE c_custkey % 3 = 1
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  private val SkewSalts = 8

  /** Salted SKEW JOIN — the join-side twin of q21's salted
    * aggregation. events is hot on event_type (5 keys carry the whole
    * fact table), so a plain fact⋈dim equi-join puts each hot key's
    * entire bucket in ONE task. Salting bounds that bucket BY
    * CONSTRUCTION: the dim side is replicated [[SkewSalts]]× (one row
    * per salt value — dim replication is cheap, dims are small
    * relative to facts even when too big to broadcast), the fact side
    * derives salt = pmod(user_id, S) as a pure projection, and the
    * join key becomes (event_type, salt) — S tasks per hot key
    * instead of one, with NO second shuffle: the post-join aggregate
    * is partial-aggregable on event_type alone.
    *
    * The result is bit-identical to the unsalted join (the oracle
    * states the PLAIN join): every fact row meets exactly one replica
    * of its dim row. At 100 TB the hierarchy is: broadcast when the
    * dim fits (free), AQE skew-split when skew is runtime-discovered,
    * SALT when the bucket bound must hold by construction — this gate
    * pins the third. The merge hint keeps the demo honest (a
    * broadcast of this tiny fixture dim would short-circuit the
    * mechanism being exercised). */
  def q70SkewJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dim = ev.groupBy(col("event_type"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("type_avg"))
    val dimSalted = dim.select(col("event_type").as("d_type"), col("type_avg"),
      explode(sequence(lit(0L), lit(SkewSalts - 1L))).as("d_salt"))
    ev.withColumn("salt", pmod(coalesce(col("user_id"), lit(0L)), lit(SkewSalts.toLong)))
      .join(dimSalted.hint("merge"),
        col("event_type") === col("d_type") && col("salt") === col("d_salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") > col("type_avg"), 1L).otherwise(0L)).as("n_above"))
      .orderBy(col("event_type"))
  }

  val q70Sql: String =
    """WITH dim AS (
      |  SELECT event_type,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS type_avg
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN e.value > d.type_avg THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_above
      |FROM events e JOIN dim d USING (event_type)
      |GROUP BY e.event_type ORDER BY event_type""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q70_skew_join_salted" -> ((q70SkewJoinSalted _, q70Sql)),
    "q60_param_query" -> ((q60ParamQuery _, q60Sql)),
    "q66_xml" -> ((q66Xml _, q66Sql)),
    "q69_exec_immediate" -> ((q69ExecImmediate _, q69Sql)),
    "q61_comparator_sort" -> ((q61ComparatorSort _, q61Sql)),
    "q62_struct_ops" -> ((q62StructOps _, q62Sql)),
    "q56_percentile" -> ((q56Percentile _, q56Sql)),
    "q57_set_ops_all" -> ((q57SetOpsAll _, q57Sql)),
    "q58_csv_map" -> ((q58CsvMap _, q58Sql)),
    "q59_interval_frame" -> ((q59IntervalFrame _, q59Sql)),
    "q52_ignore_nulls" -> ((q52IgnoreNulls _, q52Sql)),
    "q53_map_hof" -> ((q53MapHof _, q53Sql)),
    "q54_sql_udtf" -> ((q54SqlUdtf _, q54Sql)),
    "q55_explode_outer" -> ((q55ExplodeOuter _, q55Sql)))
}
