package graft.core

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The three fixed schemas (SURVEY §1.3), single source of truth —
  * no duplicate DDL/Arrow pair as in the reference. */
object Schemas {
  /** reference: `bars.py:115-127` */
  val bars: StructType = StructType.fromDDL(
    "symbol STRING, time TIMESTAMP, open DOUBLE, high DOUBLE, low DOUBLE, " +
      "close DOUBLE, volume BIGINT, trade_count BIGINT, vwap DOUBLE")

  /** reference: `stocks/trades.py:70-80` */
  val trades: StructType = StructType.fromDDL(
    "symbol STRING, time TIMESTAMP, exchange STRING, price DOUBLE, " +
      "size BIGINT, conditions STRING, id BIGINT, tape STRING")

  /** reference: `corporate_actions.py:93-104` */
  val corporateActions: StructType = StructType.fromDDL(
    "symbol STRING, ex_date TIMESTAMP, record_date TIMESTAMP, " +
      "payable_date TIMESTAMP, type STRING, amount DOUBLE, ratio DOUBLE, " +
      "new_symbol STRING, old_symbol STRING")
}

/** Per-record projection of an API JSON object into an InternalRow
  * (the reference's only expression evaluation, SURVEY §2.4 E1-E3).
  * Throws IllegalArgumentException on malformed records; the reader
  * warns + skips (E4, `common.py:484-486`). */
trait RecordParser extends Serializable {
  def schema: StructType
  def parse(symbol: String, rec: JsonNode): InternalRow

  protected def utf8(s: String): UTF8String = UTF8String.fromString(s)

  protected def reqNode(rec: JsonNode, key: String): JsonNode = {
    val n = rec.get(key)
    if (n == null || n.isNull)
      throw new IllegalArgumentException(s"missing field '$key'")
    n
  }
  protected def isoMicros(rec: JsonNode, key: String): Long = {
    val raw = reqNode(rec, key).asText()
    AlpacaOptions.parseIsoMicros(raw).getOrElse(
      throw new IllegalArgumentException(s"bad timestamp '$raw' in '$key'"))
  }
  protected def dbl(rec: JsonNode, key: String): Double = {
    val n = reqNode(rec, key)
    if (n.isNumber) n.asDouble()
    else try n.asText().toDouble
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"bad double '$n' in '$key'") }
  }
  protected def lng(rec: JsonNode, key: String): Long = {
    val n = reqNode(rec, key)
    if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble().toLong
    else try n.asText().toLong
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"bad long '$n' in '$key'") }
  }
}

/** `{t,o,h,l,c,v,n,vw}` → bar row (reference: `bars.py:199-225`). */
object BarParser extends RecordParser {
  override val schema: StructType = Schemas.bars
  override def parse(symbol: String, rec: JsonNode): InternalRow =
    InternalRow(
      utf8(symbol),
      isoMicros(rec, "t"),
      dbl(rec, "o"), dbl(rec, "h"), dbl(rec, "l"), dbl(rec, "c"),
      lng(rec, "v"), lng(rec, "n"),
      dbl(rec, "vw"))
}

/** `{t,x,p,s,c,i,z}` → trade row; the `c` array of condition codes is
  * flattened to a CSV string (reference: `stocks/trades.py:113-140`,
  * join at `:128`). */
object TradeParser extends RecordParser {
  override val schema: StructType = Schemas.trades
  override def parse(symbol: String, rec: JsonNode): InternalRow = {
    val condNode = rec.get("c")
    val conditions =
      if (condNode == null || condNode.isNull) ""
      else {
        val it = condNode.elements()
        val sb = new StringBuilder
        while (it.hasNext) {
          if (sb.nonEmpty) sb.append(',')
          sb.append(it.next().asText())
        }
        sb.toString
      }
    InternalRow(
      utf8(symbol),
      isoMicros(rec, "t"),
      utf8(reqNode(rec, "x").asText()),
      dbl(rec, "p"),
      lng(rec, "s"),
      utf8(conditions),
      lng(rec, "i"),
      utf8(reqNode(rec, "z").asText()))
  }
}

/** Corporate-action row with nullable dates and defaults; `ratio`
  * defaults to 0.0 as the reference code does (not the 1.0 its schema
  * comment claims — `corporate_actions.py:101` vs `:164`). */
object CorporateActionParser extends RecordParser {
  override val schema: StructType = Schemas.corporateActions

  private def optIsoMicros(rec: JsonNode, key: String): Any = {
    val n = rec.get(key)
    if (n == null || n.isNull || n.asText().isEmpty) null
    else AlpacaOptions.parseIsoMicros(n.asText()).getOrElse(
      throw new IllegalArgumentException(s"bad timestamp in '$key'"))
  }
  private def strDefault(rec: JsonNode, key: String, default: String): UTF8String = {
    val n = rec.get(key)
    utf8(if (n == null || n.isNull) default else n.asText())
  }
  private def dblDefault(rec: JsonNode, key: String, default: Double): Double = {
    val n = rec.get(key)
    if (n == null || n.isNull) default
    else if (n.isNumber) n.asDouble()
    else try n.asText().toDouble
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"bad double in '$key'") }
  }

  override def parse(symbol: String, rec: JsonNode): InternalRow =
    InternalRow(
      utf8(symbol),
      optIsoMicros(rec, "ex_date"),
      optIsoMicros(rec, "record_date"),
      optIsoMicros(rec, "payable_date"),
      strDefault(rec, "type", ""),
      dblDefault(rec, "amount", 0.0),
      dblDefault(rec, "ratio", 0.0),
      strDefault(rec, "new_symbol", ""),
      strDefault(rec, "old_symbol", ""))
}
