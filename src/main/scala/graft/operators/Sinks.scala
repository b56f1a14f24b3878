package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sink gate (SURVEY §2.1 S8): the reference delegates writes to Spark
 * and so do we — but delegation should still be MEASURED, so the
 * write path is a benchmarked, correctness-gated component rather
 * than only a spec. The gate writes lineitem partitioned by
 * `l_returnflag` (hive-style layout), reads it back through a
 * partition-pruned filter, and aggregates; the oracle runs the same
 * aggregation on the ORIGINAL table, so any write/read corruption,
 * schema drift, or partition misrouting breaks the hash.
 *
 * Scale notes: partitionBy on a low-cardinality column is the
 * standard lake layout — each task writes one file per local key;
 * the read-back filter prunes to one directory (PartitionFilters in
 * the plan, zero data read outside it). DECIMAL money sums keep the
 * aggregate order-independent.
 */
object Sinks {
  import Tables.t

  private def outDir(dir: String): String =
    graft.core.Scratch.dir("sink_roundtrip", dir)

  def sinkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = outDir(dir)
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_linestatus"), col("l_returnflag"))
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    spark.read.parquet(out)
      .filter(col("l_returnflag") === "A")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("l_linestatus"))
  }

  val sinkRoundtripSql: String =
    """SELECT l_linestatus, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem WHERE l_returnflag = 'A'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Bucketed-storage co-located join — the OTHER lake layout beside
    * hive partitioning: both fact tables written with
    * `bucketBy(8, orderkey).sortBy(orderkey)`, then joined on the
    * bucket key. Spark's bucketed read satisfies the join's
    * distribution requirement straight from storage, so the plan has
    * NO shuffle exchange under the join on either side (asserted in
    * SinkSpec) — at 100 TB this is how a daily fact⋈fact join avoids
    * re-shuffling the corpus every run: pay the bucketed write once,
    * join shuffle-free forever after. The merge hint keeps the small
    * local tables on the SMJ path (a broadcast would also skip the
    * shuffle, but then the plan proves nothing about bucketing).
    * Oracle: the same join+agg over the ORIGINAL parquet, so bucket
    * misrouting or dropped rows break the hash. */
  def sinkBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val base = graft.core.Scratch.dir("bucketed", dir)
    val liTable = s"graft_li_bucketed_$suffix"
    val ordTable = s"graft_ord_bucketed_$suffix"
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/lineitem").saveAsTable(liTable)
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/orders").saveAsTable(ordTable)
    spark.table(liTable).hint("merge")
      .join(spark.table(ordTable), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  val sinkBucketedJoinSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Schema evolution on the lake: an old-schema batch (no
    * `o_totalprice`) and a new-schema batch land in the same dataset;
    * `mergeSchema` reads the union schema with nulls for the missing
    * column, and the aggregation proves both batches survive intact
    * (counts per status; money summed over the rows that HAVE the
    * column; explicit null accounting). This is the ingest reality a
    * long-lived 100 TB corpus lives with — producers upgrade schemas
    * mid-stream and history is never rewritten.
    *
    * Scale notes: schema merge costs one footer read per file at
    * planning (no data pass); at production scale pin the merged
    * schema explicitly (or in a catalog) instead of re-inferring per
    * query, exactly as the explicit `schema(...)` read here would. */
  def sinkSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("schema_evo", dir)
    val orders = t(spark, dir, "orders")
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").parquet(s"$out/batch=old")
    orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$out/batch=new")
    spark.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price_new"))
      .orderBy(col("o_orderstatus"))
  }

  val sinkSchemaEvolutionSql: String =
    """WITH unioned AS (
      |  SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_missing,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price_new
      |FROM unioned
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Upsert THROUGH the sink — `q26_upsert` computes the latest-wins
    * merge in memory; this gate commits it to lake storage the way a
    * cluster without a table format does it: DYNAMIC partition
    * overwrite of exactly the partitions the delta touches.
    *
    *  1. snapshot -> parquet partitioned by `pkey = o_orderkey div
    *     2000` (a KEY-STABLE partitioning: an update can't move a row
    *     across partitions — the precondition for partition-level
    *     upsert);
    *  2. delta = some keys of two partitions, status 'X', price+10,
    *     version 1;
    *  3. merge = read ONLY the affected partitions (partition-pruned
    *     scan), union the delta, latest-wins by version, write to a
    *     STAGING dir (write-audit-publish: Spark refuses to overwrite
    *     a path it is reading, and a real pipeline audits here);
    *  4. publish staging with `partitionOverwriteMode=dynamic` —
    *     untouched partitions' files are never rewritten.
    *
    * The read-back aggregate covers the WHOLE table, so the hash
    * certifies both halves: updated partitions hold the merge,
    * untouched partitions still hold version-0 rows (a static-mode
    * overwrite would have deleted them and broken the count).
    *
    * Scale: the delta manifest (`affected`) is a driver-side collect
    * of DISTINCT PARTITION IDS — bounded by the delta's partition
    * count, never by rows. The merge cost is |affected partitions| +
    * |delta|, independent of corpus size; the same shape at 100 TB is
    * a daily-delta merge touching a few hundred of a million
    * partitions. */
  def sinkUpsertRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("sink_upsert", dir)
    val staging = out + "_staging"
    val base = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        lit(0L).as("version"))
      .withColumn("pkey", expr("o_orderkey div 2000L"))
    // Shuffle rows to their pkey BEFORE partitionBy: each pkey then lives in
    // exactly one task, so the dynamic write emits one file per partition
    // instead of (tasks × partitions) tiny files — the difference between
    // |partitions| and |partitions|×|executors| files at 100 TB.
    base.repartition(col("pkey"))
      .write.mode("overwrite").partitionBy("pkey").parquet(out)
    val delta = t(spark, dir, "orders")
      .filter(expr("o_orderkey div 2000L IN (2, 5) AND o_orderkey % 3 = 0"))
      .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") + lit(10))
          .cast("double").as("o_totalprice"),
        lit(1L).as("version"))
      .withColumn("pkey", expr("o_orderkey div 2000L"))
    val affected = delta.select(col("pkey")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // Empty delta (tiny scale factors never reach pkeys 2/5): nothing
    // to merge — a dynamic overwrite of zero partitions would write no
    // staging files at all and the read-back would fail on schema
    // inference. Production semantics are identical: a no-op publish.
    if (affected.nonEmpty) try {
      val current = spark.read.parquet(out)
        .withColumn("pkey", col("pkey").cast("long"))
        .filter(col("pkey").isin(affected: _*))
      val byKey = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderkey")).orderBy(col("version").desc)
      current.unionByName(delta)
        .withColumn("rn", row_number().over(byKey))
        .filter(col("rn") === 1).drop("rn")
        .repartition(col("pkey"))
        .write.mode("overwrite").partitionBy("pkey").parquet(staging)
      spark.read.parquet(staging)
        .repartition(col("pkey"))
        .write.mode("overwrite").partitionBy("pkey").parquet(out)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    spark.read.parquet(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_total"),
        sum(col("version")).as("n_updated"))
      .orderBy(col("o_orderstatus"))
  }

  val sinkUpsertRoundtripSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice,
      |    CAST(0 AS BIGINT) AS version
      |  FROM orders),
      |delta AS (
      |  SELECT o_orderkey, 'X' AS o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 10 AS DOUBLE) AS o_totalprice,
      |    CAST(1 AS BIGINT) AS version
      |  FROM orders
      |  WHERE (o_orderkey // 2000) IN (2, 5) AND o_orderkey % 3 = 0),
      |merged AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY o_orderkey ORDER BY version DESC) AS rn
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta))
      |SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
      |  CAST(SUM(version) AS BIGINT) AS n_updated
      |FROM merged WHERE rn = 1
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "sink_partitioned_roundtrip" -> ((sinkRoundtrip _, sinkRoundtripSql)),
    "sink_bucketed_join" -> ((sinkBucketedJoin _, sinkBucketedJoinSql)),
    "sink_schema_evolution" -> ((sinkSchemaEvolution _, sinkSchemaEvolutionSql)),
    "sink_upsert_roundtrip" -> ((sinkUpsertRoundtrip _, sinkUpsertRoundtripSql)),
    // persistence artifact for the incremental-dedup corpus index
    // (VERDICT r12 next #3); body lives beside the index machinery
    "sink_band_index_persist" ->
      ((Dedup.bandIndexPersist _, Dedup.bandIndexPersistSql)),
    // persistence artifact for the IVF-PQ similarity index (r13);
    // body lives beside the index machinery
    "sink_ann_index_persist" ->
      ((Similarity.annIndexPersist _, Similarity.annIndexPersistSql)),
    // small-files compaction of the append-loop band index (r13)
    "sink_band_index_compact" ->
      ((Dedup.bandIndexCompact _, Dedup.bandIndexCompactSql)),
    // daily embedding ingest: delta assigned/encoded against the
    // persisted model only, appended, certified vs from-scratch (r13)
    "sink_ann_index_append" ->
      ((Similarity.annIndexAppend _, Similarity.annIndexPersistSql)))
}
