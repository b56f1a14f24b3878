package graft.core

import org.apache.spark.sql.SparkSession

/** Session-conf knobs that gates flip, centralized so the conf state
  * every affected gate sees is IDENTICAL regardless of which gate ran
  * first (VERDICT r8 §wrong #1b: scattered one-off `conf.set`s made
  * each gate's plan a function of execution order across harnesses).
  *
  * The v2-bucketing trio only changes plans for DataSource-V2 scans
  * that report a KeyGroupedPartitioning — in this library, exactly the
  * `cluster_by_symbol=true` Alpaca scans (v1 parquet `bucketBy` tables
  * use a separate config family and are untouched). Every gate that
  * loads such a scan calls [[enableSpj]], so all three flags are
  * always-on by the time any storage-partitioned plan is built: plan =
  * f(flags=true) for every affected gate under any ordering.
  */
object SessionTuning {
  /** All three storage-partitioned-join flags together: enabled (the
    * master gate Spark hides partition grouping behind),
    * pushPartValues (tolerate mismatched partition-value sets across
    * join sides), shuffle (let the NON-key-grouped side exchange into
    * the scan's grouping so the scan side never moves). */
  def enableSpj(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
  }

  /** Data-format fact, not a tuning experiment: some driver data drops
    * ship events.parquet with TIMESTAMP(NANOS), which Spark's reader
    * rejects unless nanos read as long. Constant for the process —
    * harness mains set it at session build so no gate's read schema
    * depends on whether an events-reading gate ran earlier. */
  def nanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
}
