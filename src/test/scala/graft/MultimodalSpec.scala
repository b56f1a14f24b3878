package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Golden-value check of the stub decode path (rows-only op: no
  * DuckDB oracle). Expected values are computed independently in the
  * driver from the raw text bytes. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("mm_chunk_features features match independently computed byte means") {
    val got = Multimodal.mmChunkFeatures(spark, dir)
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

  /** Independent recomputation of the bmp round trip's closed form:
    * channel sums over the generating formula (floorMod — total over
    * negative ids too, the r10 ADVICE fix). */
  test("mm_bmp_decode sums match the generating formula") {
    val rows = Multimodal.mmBmpDecode(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = (8 + id % 8).toInt; val h = (8 + id % 5).toInt
      assert(r.getLong(1) == 1L, s"bmp sig doc $id")
      assert(r.getLong(2) == w && r.getLong(3) == h, s"dims doc $id")
      var sr = 0L
      for (y <- 0 until h; x <- 0 until w)
        sr += Math.floorMod(id + 3L * x + 5L * y, 256L)
      assert(r.getLong(4) == sr, s"sum_r doc $id")
    }
  }

  test("mm_jpeg_decode: signature, dims, and the ±1 error bound hold") {
    val rows = Multimodal.mmJpegDecode(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 1L, s"jpeg SOI/EOI doc $id")
      assert(r.getLong(2) == 8 + id % 8 && r.getLong(3) == 8 + id % 5)
      assert(r.getLong(5) == 1L, s"err > 1 on doc $id")
    }
  }

  /** The bilinear identity: summing 4·interpolant over the 2×-upsampled
    * grid equals summing each source pixel weighted by how many output
    * cells reference it — recomputed here directly from the kernel
    * definition, independent of the SQL oracle. */
  test("mm_resize_real matches a direct bilinear recomputation") {
    val rows = Multimodal.mmResizeReal(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val w = (8 + id % 8).toInt; val h = (8 + id % 5).toInt
      def v(x: Int, y: Int) = Math.floorMod(id + 3L * x + 5L * y, 256L)
      val rw = 2 * w - 1; val rh = 2 * h - 1
      assert(r.getLong(1) == rw && r.getLong(2) == rh)
      var s4 = 0L
      for (ry <- 0 until rh; rx <- 0 until rw) {
        val x0 = rx / 2; val y0 = ry / 2
        val x1 = (rx + 1) / 2; val y1 = (ry + 1) / 2
        s4 += v(x0, y0) + v(x1, y0) + v(x0, y1) + v(x1, y1)
      }
      assert(r.getLong(3) == s4, s"sum4_r doc $id")
    }
  }
}
