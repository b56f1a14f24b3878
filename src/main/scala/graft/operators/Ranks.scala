package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed exact total-order ranking.
  *
  * `Window.orderBy(...)` with no PARTITION BY plans a SINGLE-partition
  * window — the whole input through one task, the classic scale-killer
  * for global ranks. The scale path here is the bucket-offset form of
  * zipWithIndex:
  *
  *   1. the caller supplies a MONOTONE BUCKET of the sort key (all
  *      keys in bucket b sort before all keys in bucket b+1 — e.g.
  *      the key's high bits). Value-derived bucketing replaces
  *      `repartitionByRange`'s sampled bounds on purpose: the
  *      RangePartitioner seeds its reservoir sample with the RDD id,
  *      so two executions of the same lineage pick DIFFERENT bounds —
  *      the counts job and the rank job would disagree (measured:
  *      interleaved block envelopes at ×100 soak). Static buckets are
  *      execution-independent by construction;
  *   2. one tiny job counts rows per bucket; prefix sums in bucket
  *      order become per-bucket offsets (driver state bounded by the
  *      BUCKET count, never rows);
  *   3. local rank = `row_number()` windowed BY BUCKET (parallel, one
  *      hash exchange); global rank = local + broadcast offset.
  *
  * Fully whole-stage-codegen (the first cut assigned ranks in an RDD
  * `mapPartitionsWithIndex`; the InternalRow→Row conversion made it
  * slower than the single-partition window below ~10M rows). Skew =
  * the largest bucket; pick granularity ≫ parallelism (a 256-way
  * bucket over a 16-bit key keeps the worst task at 1/256th). */
object Ranks {

  /** Appends `rnCol` = 1-based global row number under the total
    * order `sortCols` (which MUST be a total order — ties would make
    * the rank nondeterministic). `bucket` MUST be monotone in that
    * order: min(keys in b+1) ≥ max(keys in b). */
  def globalRowNumber(df: DataFrame, bucket: Column, rnCol: String,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val bCol = "_graft_rank_bucket"
    val offCol = "_graft_rank_off"
    val bucketed = df.withColumn(bCol, bucket.cast("long"))
    val counts = bucketed.groupBy(col(bCol)).agg(count(lit(1)).as("n"))
      .collect().map { r =>
        // fail fast, not NPE: a null bucket means the caller's bucket
        // expression doesn't cover its domain
        require(!r.isNullAt(0),
          s"globalRowNumber: null bucket value (${r.getLong(1)} rows) — " +
            "the bucket expression must be total over the input")
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    val offsets = counts.scanLeft((0L, 0L)) {
      case ((_, acc), (b, n)) => (b, acc + n)
    }.init.map(_._2) // exclusive prefix sums, aligned with counts order
    val offsetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        counts.map(_._1).zip(offsets).map { case (b, off) => Row(b, off) }
          .toSeq, 1),
      StructType(Seq(StructField(bCol, LongType, nullable = false),
        StructField(offCol, LongType, nullable = false))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(bCol)).orderBy(sortCols: _*)
    // LEFT join + loud failure instead of an inner join: if a
    // nondeterministic upstream re-derives DIFFERENT bucket values in
    // this second execution of the plan, the inner join would silently
    // DROP those rows; here they surface as a raised error inside the
    // rank expression (coalesce only evaluates the raise on a miss, so
    // the happy path stays codegen'd with zero extra jobs).
    val missMsg = "globalRowNumber: bucket value absent from the counts " +
      "pass — nondeterministic upstream re-derived different buckets " +
      "(cache/checkpoint the input) or the bucket expression is unstable"
    bucketed.join(broadcast(offsetsDf), Seq(bCol), "left")
      .withColumn(rnCol, row_number().over(w).cast("long") +
        coalesce(col(offCol), raise_error(lit(missMsg)).cast("long")))
      .drop(bCol, offCol)
  }
}
