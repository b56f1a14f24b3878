package graft.connector

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

import graft.core.RecordParser

/** Stream offset = high-water mark in epoch micros (self-describing,
  * so checkpoint restart needs no external state). */
case class TimeOffset(micros: Long) extends Offset {
  override def json(): String = micros.toString
}

/**
 * Micro-batch streaming over the Alpaca endpoints — the natural
 * extension the reference lacks (SURVEY §2.11). Each trigger advances
 * the time high-water mark by `stream_step` (clamped to the configured
 * `end`) and plans one symbol × [prev, next) slice per symbol; the
 * batch PartitionReader is reused verbatim, so pagination/retry/parse
 * behavior is identical to the batch path.
 *
 * Intervals are half-open and contiguous (matching the batch partition
 * tiling), so no bar is ever emitted twice across micro-batches. In a
 * live deployment `end` would be replaced by wall-clock now() per
 * trigger; here it is bounded by the option for determinism.
 */
class AlpacaMicroBatchStream(
    sourceDef: AlpacaSourceDef,
    cfg: AlpacaScanConfig,
    stepMicros: Long,
    outSchema: org.apache.spark.sql.types.StructType = null,
    limitOpt: Option[Int] = None) extends MicroBatchStream {

  private var currentEnd: Long = cfg.startMicros

  override def initialOffset(): Offset = TimeOffset(cfg.startMicros)

  override def latestOffset(): Offset = synchronized {
    currentEnd = math.min(cfg.endMicros, Math.addExact(currentEnd, stepMicros))
    TimeOffset(currentEnd)
  }

  override def deserializeOffset(json: String): Offset = {
    val us = json.trim.toLong
    synchronized { currentEnd = math.max(currentEnd, us) }
    TimeOffset(us)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TimeOffset].micros
    val e = end.asInstanceOf[TimeOffset].micros
    if (e <= s) Array.empty
    else cfg.symbols.map(SymbolTimeRangePartition(_, s, e)).toArray[InputPartition]
  }

  /** Row-based (columnar = false): stateful streaming plans consume
    * rows. The scan's pruned schema and pushed limit are honored so
    * emitted rows always match the scan's declared readSchema(). */
  override def createReaderFactory(): PartitionReaderFactory =
    new AlpacaReaderFactory(cfg, sourceDef.versionedPath, sourceDef.dataKey,
      sourceDef.parser, outSchema, limitOpt, columnar = false)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
