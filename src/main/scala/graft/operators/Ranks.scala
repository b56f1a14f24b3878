package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed exact total-order ranking.
  *
  * `Window.orderBy(...)` with no PARTITION BY plans a SINGLE-partition
  * window — the whole input through one task, the classic scale-killer
  * for global ranks. This is the scale path instead, the same
  * machinery Spark's own total sort uses plus the zipWithIndex offset
  * trick:
  *
  *   1. `repartitionByRange` on the sort key: partition i's keys all
  *      precede partition i+1's (sampled bounds — the SAME sampling
  *      Spark's orderBy does);
  *   2. sort within partitions;
  *   3. one tiny job counts rows per partition; prefix sums become
  *      per-partition rank offsets (driver state bounded by the
  *      partition COUNT, never rows);
  *   4. one `mapPartitionsWithIndex` pass assigns rank = offset +
  *      local position.
  *
  * The rank is EXACT and layout-independent: range partitioning
  * guarantees cross-partition order whatever boundaries the sampling
  * picked, and in-partition positions come from the explicit sort.
  * The RDD hop is the documented per-partition-imperative exception
  * (this is zipWithIndex, which has no Dataset equivalent); the
  * pipeline re-enters codegen immediately after. */
object Ranks {

  /** Appends `rnCol` = 1-based global row number under the total
    * order `sortCols` (which MUST be a total order — ties would make
    * the rank layout-dependent). */
  def globalRowNumber(df: DataFrame, numParts: Int, rnCol: String,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(numParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = sorted.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = rdd
        .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size.toLong)))
        .collect().sortBy(_._1) // one (pid, n) pair per partition
      val offsets = counts.scanLeft((0, 0L)) {
        case ((_, acc), (pid, n)) => (pid, acc + n)
      }.init.map(_._2) // exclusive prefix sums, indexed by pid
      val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
        var r = if (pid < offsets.length) offsets(pid) else 0L
        it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
      }
      val schema = StructType(sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(rnCol, LongType, nullable = false))
      // ranks are final before unpersist: createDataFrame is lazy, so
      // materialize through the caller's action — the persist covers
      // both jobs above; the downstream plan re-reads the cached rdd
      spark.createDataFrame(ranked, schema)
    } finally {
      // lazy unpersist: blocks nothing, frees after downstream reads
      rdd.unpersist(blocking = false)
    }
  }
}
