package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Golden-value check of the stub decode path (rows-only op: no
  * DuckDB oracle). Expected values are computed independently in the
  * driver from the raw text bytes. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("mm_decode_stub features match independently computed byte means") {
    val got = Multimodal.mmDecodeStub(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val (nBytes, meanByte) = got(id)
      assert(nBytes == bytes.length)
      val expectedMean = bytes.map(_.toInt & 0xff).sum.toDouble / bytes.length
      assert(math.abs(meanByte - expectedMean) < 1e-12, s"doc $id")
    }
  }

  test("media records keep payload binary and metadata typed") {
    val df = Multimodal.mediaRecords(spark, dir)
    val f = df.schema("payload")
    assert(f.dataType.typeName == "binary")
    val row = df.filter(df("doc_id") === 0).head
    assert(row.getAs[Int]("width") == 32 && row.getAs[Int]("channels") == 3)
  }
}
