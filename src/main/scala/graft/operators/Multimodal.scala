package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata.
  * (Images/audio/video at 100 TB ride as exactly this shape: bytes +
  * a metadata struct; Spark never interprets the bytes.) */
case class MediaRecord(doc_id: Long, payload: Array[Byte], width: Int,
    height: Int, channels: Int)

/** Deterministic stand-in for decoded media features. */
case class MediaFeatures(doc_id: Long, n_bytes: Long, mean_byte: Double,
    chunk_means: Array[Double])

/**
 * Multimodal-column plumbing over synthesized binary payloads. Formats
 * the JDK decodes natively are REAL round trips — WAV
 * (javax.sound.sampled), PNG/BMP/JPEG (javax.imageio) writer → bytes →
 * parser — plus a real 2-D bilinear resize over the decoded pixels;
 * only codec-dependent formats the container can't decode remain
 * clearly-marked deterministic stubs. The Spark-side plumbing —
 * schema, binary columns, per-partition batch processing, feature
 * arrays — is real and tested throughout.
 *
 * Scale design: payloads stay in the executor partition end-to-end
 * (mapPartitions = the Scala analogue of mapInPandas batch iteration);
 * nothing is collected to the driver; features are narrow rows so any
 * downstream shuffle moves features, not media bytes.
 */
object Multimodal {
  import Tables.t

  /** Typed media records: text bytes as payload + synthetic metadata.
    * The height derivation reduces doc_id mod 64 BEFORE multiplying:
    * ((id % 64) * 7) % 64 ≡ (id * 7) % 64 (congruence, same C-modulo
    * sign either way) but cannot overflow — the direct form threw
    * ARITHMETIC_OVERFLOW under ANSI for int64-edge ids (r5 fuzz
    * find), and DuckDB errors on BIGINT overflow too. */
  def mediaRecords(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      (lit(32) + col("doc_id") % 64).cast("int").as("width"),
      (lit(32) + (col("doc_id") % 64) * 7 % 64).cast("int").as("height"),
      lit(3).as("channels"))

  /** doc_id spine for the synthetic-payload codec gates, spread like
    * [[mediaRecordsPar]] — 8 bytes/row into the exchange, a full
    * encode+decode round trip per row after it. */
  private def docIdsPar(spark: SparkSession, dir: String): DataFrame =
    Tables.floorByKey(
      t(spark, dir, "documents").select(col("doc_id")), col("doc_id"))

  /** Executor-side, once per partition (an idempotent static write):
    * ImageIO's DEFAULT stream cache backs every
    * createImageOutputStream / ImageIO.read with a TEMP FILE on disk.
    * Measured on this box (CodecBench micro, 5k gif round trips):
    * 1.22 s serial with the disk cache, 0.49 s serial without, 0.15 s
    * at 32 threads without — i.e. the disk cache is 2.5× pure
    * overhead per record AND a filesystem lock convoy once the
    * parallelism floor spreads codec tasks across cores. Memory-cached
    * streams are exact byte-for-byte; only the backing store changes.
    * DELIBERATELY JVM-global (ADVICE r13 #2): ImageIO's cache flag is
    * a process-wide static and this library is the only ImageIO user
    * in its executors; outputs are byte-identical either way, and the
    * images here are KBs (a disk-backed cache buys nothing). A host
    * application embedding this library alongside heap-exceeding
    * ImageIO work would want per-stream MemoryCacheImageInputStreams
    * instead. */
  private def imageIoNoDiskCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Metadata extraction (no decode): byte length, leading byte,
    * digest, pixel geometry — all pure projections with a full oracle. */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    mediaRecords(spark, dir).select(
      col("doc_id"),
      octet_length(col("payload")).cast("bigint").as("n_bytes"),
      ascii(col("payload").cast("string")).as("first_byte"),
      md5(col("payload").cast("string")).as("payload_md5"),
      col("width"), col("height"), col("channels"),
      (col("width").cast("bigint") * col("height") * col("channels"))
        .as("n_values"))
      .orderBy(col("doc_id"))

  val mmMetaSql: String =
    """SELECT doc_id,
      |  CAST(STRLEN(text) AS BIGINT) AS n_bytes,
      |  ASCII(SUBSTR(text, 1, 1)) AS first_byte,
      |  md5(text) AS payload_md5,
      |  CAST(32 + doc_id % 64 AS INT) AS width,
      |  CAST(32 + (doc_id % 64) * 7 % 64 AS INT) AS height,
      |  3 AS channels,
      |  CAST(32 + doc_id % 64 AS BIGINT) * (32 + (doc_id % 64) * 7 % 64) * 3 AS n_values
      |FROM documents ORDER BY doc_id""".stripMargin

  /**
   * Codec-free chunk features (named mm_decode_stub through r10;
   * renamed once the REAL decoder gates landed — [[mmPngDecode]],
   * [[mmBmpDecode]], [[mmJpegDecode]], [[mmGifDecode]],
   * [[mmWavDecode]] own the "decode" claim now): deterministic
   * per-chunk byte means over the raw payload — the container-
   * agnostic screening pass a media pipeline runs BEFORE any decode
   * (truncation/corruption triage, cheap dedup signals). The batch
   * shape (record iterator in, feature iterator out, zero driver
   * involvement) is the same contract the codec gates use.
   *
   * Fully oracled: the corpus is ASCII (verified: strlen == length on
   * every SF), so per-byte arithmetic equals DuckDB per-code-point
   * arithmetic, and every sum/mean below is an exact integer sum
   * followed by one double division — bit-identical cross-engine.
   * Golden values are additionally asserted in MultimodalSpec.
   */
  def mmChunkFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = mediaRecords(spark, dir).as[MediaRecord]
    ds.mapPartitions { records =>
      records.map { r =>
        val bytes = r.payload
        val n = bytes.length
        val mean =
          if (n == 0) 0.0 else bytes.map(_.toInt & 0xff).sum.toDouble / n
        val chunkMeans = (0 until 4).map { c =>
          val lo = c * n / 4
          val hi = (c + 1) * n / 4
          if (hi <= lo) 0.0
          else bytes.slice(lo, hi).map(_.toInt & 0xff).sum.toDouble / (hi - lo)
        }.toArray
        MediaFeatures(r.doc_id, n.toLong, mean, chunkMeans)
      }
    }.toDF()
      .select(col("doc_id"), col("n_bytes"), col("mean_byte"),
        (expr("aggregate(chunk_means, 0.0D, (acc, x) -> acc + x)") / 4)
          .as("mean_of_chunks"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of the stub-decode arithmetic: code points stand in
    * for bytes (ASCII corpus), list_slice bounds mirror the Spark
    * chunking (lo = c*n/4 exclusive, hi = (c+1)*n/4 inclusive,
    * 1-based), and the chunk-mean sum keeps the left-associated
    * order of the Spark-side aggregate(). */
  val mmChunkFeaturesSql: String = {
    // empty-chunk/empty-doc guards mirror the Spark side's `if (n == 0)
    // 0.0` / `if (hi <= lo) 0.0` exactly — without them an empty
    // document scores NULL here (sum of [] is NULL) but 0.0 in Spark
    // (r5 fuzz find)
    val chunkMeans = (0 until 4).map { c =>
      val lo = s"($c * n) // 4"
      val hi = s"(${c + 1} * n) // 4"
      s"CASE WHEN $hi <= $lo THEN 0.0 ELSE " +
        s"CAST(list_aggregate(list_slice(cps, $lo + 1, $hi), 'sum') AS DOUBLE) / ($hi - $lo) END AS m$c"
    }.mkString(",\n      |    ").stripMargin
    s"""WITH b AS (
       |  SELECT doc_id, strlen(text) AS n,
       |    list_transform(range(1, strlen(text) + 1), i -> ascii(substr(text, i, 1))) AS cps
       |  FROM documents),
       |chunks AS (
       |  SELECT doc_id, n,
       |    CASE WHEN n = 0 THEN 0.0
       |         ELSE CAST(list_aggregate(cps, 'sum') AS DOUBLE) / n END AS mean_byte,
       |    $chunkMeans
       |  FROM b)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, mean_byte,
       |  (((m0 + m1) + m2) + m3) / 4 AS mean_of_chunks
       |FROM chunks ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------- frame sample
  private val FrameBytes = 256
  private val FrameStride = 4

  /** Chunk sampling (named mm_framesample through r12; renamed per
    * the r11 honesty precedent — the "frame" names belong to the REAL
    * decoded-frame gates [[mmGifFrameSample]]/[[mmGifSceneCut]]): each
    * payload is cut into 256-byte CHUNKS and every 4th chunk is
    * extracted with per-chunk features (digest + byte mean). A real
    * pipeline swaps the slice for a container-format keyframe decode;
    * the shape — one record in, a VARIABLE number of feature rows out,
    * inside the partition iterator (flatMap), bytes never leaving the
    * executor — is the real contract and survives 100 TB unchanged.
    * Fully oracled via the ASCII corpus (frame digest = md5 of the
    * same substring in DuckDB; mean = exact integer sum / length). */
  def mmChunkSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = mediaRecords(spark, dir).as[MediaRecord]
    ds.mapPartitions { records =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      records.flatMap { r =>
        val n = r.payload.length
        val nFrames = (n + FrameBytes - 1) / FrameBytes
        (0 until nFrames by FrameStride).iterator.map { f =>
          val lo = f * FrameBytes
          val hi = math.min(n, lo + FrameBytes)
          val frame = r.payload.slice(lo, hi)
          digest.reset()
          val hex = digest.digest(frame).map("%02x".format(_)).mkString
          val mean = frame.map(_.toInt & 0xff).sum.toDouble / (hi - lo)
          (r.doc_id, f, hex, mean)
        }
      }
    }.toDF("doc_id", "frame_idx", "frame_md5", "frame_mean")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val mmChunkSampleSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, text, strlen(text) AS n,
       |    (strlen(text) + ${FrameBytes - 1}) // $FrameBytes AS n_frames
       |  FROM documents),
       |frames AS (
       |  SELECT doc_id, CAST(f AS INT) AS frame_idx,
       |    substr(text, f * $FrameBytes + 1, $FrameBytes) AS frame,
       |    LEAST(n, (f + 1) * $FrameBytes) - f * $FrameBytes AS flen
       |  FROM b, UNNEST(RANGE(0, n_frames, $FrameStride)) AS r(f))
       |SELECT doc_id, frame_idx, md5(frame) AS frame_md5,
       |  CAST(list_aggregate(list_transform(range(1, flen + 1),
       |    i -> ascii(substr(frame, i, 1))), 'sum') AS DOUBLE) / flen AS frame_mean
       |FROM frames ORDER BY doc_id, frame_idx""".stripMargin

  // --------------------------------------------------- resize/resample
  private val ResizeBuckets = 16

  /** 1-D byte resample (named mm_resize_stub through r10; renamed —
    * the REAL 2-D bilinear resize over decoded pixels is
    * [[mmResizeReal]]): every payload is resampled to a FIXED-length
    * 16-bucket signal (bucket k = mean byte over [k·n/16,
    * (k+1)·n/16)) — variable-size media in, fixed-size representation
    * out, computed inside the partition iterator; the audio/
    * byte-stream downsampling shape, kept beside the pixel-space
    * twin. Oracled like [[mmChunkFeatures]] (ASCII corpus ⇒ exact
    * integer sums, one IEEE division per bucket). */
  def mmResample1d(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = mediaRecords(spark, dir).as[MediaRecord]
    ds.mapPartitions { records =>
      records.flatMap { r =>
        val n = r.payload.length
        (0 until ResizeBuckets).iterator.map { k =>
          val lo = k * n / ResizeBuckets
          val hi = (k + 1) * n / ResizeBuckets
          val mean =
            if (hi <= lo) 0.0
            else r.payload.slice(lo, hi).map(_.toInt & 0xff).sum.toDouble / (hi - lo)
          (r.doc_id, k, mean)
        }
      }
    }.toDF("doc_id", "bucket", "bucket_mean")
      .orderBy(col("doc_id"), col("bucket"))
  }

  val mmResample1dSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, strlen(text) AS n,
       |    list_transform(range(1, strlen(text) + 1), i -> ascii(substr(text, i, 1))) AS cps
       |  FROM documents)
       |SELECT doc_id, CAST(k AS INT) AS bucket,
       |  CASE WHEN ((k + 1) * n) // $ResizeBuckets <= (k * n) // $ResizeBuckets THEN 0.0
       |       ELSE CAST(list_aggregate(list_slice(cps,
       |              (k * n) // $ResizeBuckets + 1, ((k + 1) * n) // $ResizeBuckets),
       |              'sum') AS DOUBLE)
       |            / (((k + 1) * n) // $ResizeBuckets - (k * n) // $ResizeBuckets)
       |  END AS bucket_mean
       |FROM b, UNNEST(RANGE(0, $ResizeBuckets)) AS r(k)
       |ORDER BY doc_id, bucket""".stripMargin

  // ------------------------------------------- audio window energy
  private val AudioFrameLen = 256
  private val AudioHop = 128

  /** Audio-feature plumbing: the payload read as PCM-8-style samples,
    * framed into $AudioFrameLen-sample windows at 50% hop, per-frame
    * energy = Σ(sample−128)² — the windowing/feature shape every
    * audio pipeline runs (VAD, loudness normalization, spectral
    * stubs), with the codec seam being exactly "replace the sample
    * extractor". All arithmetic is exact BIGINT, so parity is
    * structural. Unlike `mmChunkFeatures`'s mapPartitions contract this
    * path stays INSIDE whole-stage codegen: nested HOFs (transform
    * over frames → aggregate over a slice) — the two executor-side
    * batch-processing idioms a multimodal pipeline chooses between.
    * Frames never leave the executor; the output is one narrow row
    * per document. */
  def mmAudioEnergy(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("codes",
        // one O(n) pass: split('') yields the char array; the
        // sequence+substring form re-scanned the prefix per char
        // (quadratic in document length — a real smell at book-length
        // payloads even though both forms parity-match)
        expr("""transform(split(text, ''),
               |  c -> CAST(ascii(c) AS BIGINT) - 128)""".stripMargin))
      .withColumn("n_frames",
        expr(s"""CASE WHEN length(text) >= $AudioFrameLen
                |  THEN CAST((length(text) - $AudioFrameLen) DIV $AudioHop AS INT) + 1
                |  ELSE 0 END""".stripMargin))
      .withColumn("energies",
        expr(s"""CASE WHEN n_frames > 0 THEN
                |  transform(sequence(0, n_frames - 1), f ->
                |    aggregate(slice(codes, f * $AudioHop + 1, $AudioFrameLen),
                |      CAST(0 AS BIGINT), (a, x) -> a + x * x))
                |  ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin))
      .select(col("doc_id"),
        col("n_frames").cast("bigint").as("n_frames"),
        expr("aggregate(energies, CAST(0 AS BIGINT), (a, e) -> a + e)")
          .as("sum_energy"),
        expr("array_max(energies)").as("max_energy"))
      .orderBy(col("doc_id"))

  val mmAudioEnergySql: String =
    s"""WITH d AS (SELECT doc_id, text, LENGTH(text) AS n FROM documents),
       |c AS (
       |  SELECT doc_id, n,
       |    LIST_TRANSFORM(RANGE(1, n + 1),
       |      i -> CAST(ASCII(SUBSTR(text, i, 1)) AS BIGINT) - 128) AS codes,
       |    CASE WHEN n >= $AudioFrameLen
       |         THEN (n - $AudioFrameLen) // $AudioHop + 1 ELSE 0 END AS n_frames
       |  FROM d),
       |e AS (
       |  SELECT doc_id, n_frames,
       |    CASE WHEN n_frames > 0 THEN
       |      LIST_TRANSFORM(RANGE(0, n_frames), f ->
       |        LIST_AGGREGATE(
       |          LIST_TRANSFORM(
       |            LIST_SLICE(codes, f * $AudioHop + 1, f * $AudioHop + $AudioFrameLen),
       |            x -> x * x),
       |          'sum'))
       |      ELSE [] END AS energies
       |  FROM c)
       |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
       |  CAST(COALESCE(LIST_AGGREGATE(energies, 'sum'), 0) AS BIGINT) AS sum_energy,
       |  CAST(LIST_AGGREGATE(energies, 'max') AS BIGINT) AS max_energy
       |FROM e ORDER BY doc_id""".stripMargin

  /** `binaryFile`-source ingestion — how a media corpus actually
    * LANDS: one opaque file per asset in a directory, read by Spark's
    * binaryFile source into (path, length, content) rows with the
    * asset id recovered from the file name. The gate materializes a
    * landing directory from a deterministic document sample
    * (executor-side writes, nothing through the driver), reads it
    * back through the source, and emits (doc_id, n_bytes, md5) — the
    * oracle computes the same triple straight from the documents
    * table, so a lost, truncated, or mis-keyed file breaks the hash.
    *
    * Scale: binaryFile scans parallelize by file; content stays in
    * the reading partition (the mediaRecords contract) and only the
    * narrow metadata rows move. Production sets
    * spark.sql.files.maxPartitionBytes to pack small assets and
    * pathGlobFilter to prune non-media files at listing time. */
  def mmBinaryIngest(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val landing = graft.core.Scratch.dir("mm_ingest", dir)
    val lp = Paths.get(landing)
    if (Files.exists(lp)) {
      val w = Files.walk(lp)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally w.close()
    }
    Files.createDirectories(lp)
    t(spark, dir, "documents")
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("text"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
          Files.write(Paths.get(landing, s"$id.bin"), bytes)
        }
      }
    spark.read.format("binaryFile").load(landing)
      .select(
        regexp_extract(col("path"), "(-?\\d+)\\.bin$", 1)
          .cast("bigint").as("doc_id"),
        col("length").cast("bigint").as("n_bytes"),
        md5(col("content")).as("payload_md5"))
      .orderBy(col("doc_id"))
  }

  val mmBinaryIngestSql: String =
    """SELECT doc_id,
      |  CAST(STRLEN(COALESCE(text, '')) AS BIGINT) AS n_bytes,
      |  MD5(COALESCE(text, '')) AS payload_md5
      |FROM documents WHERE doc_id % 50 = 0
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- video scene cuts
  private val SceneTau = 4L

  /** Cut detection over byte CHUNKS (named mm_scene_cut through r12;
    * renamed — the real decoded-frame scene cut is [[mmGifSceneCut]]):
    * consecutive 256-byte chunks per payload, boundary where the
    * inter-chunk mean-intensity jump exceeds τ. A real pipeline swaps the byte
    * mean for a decoded-luma mean (or histogram distance) — the
    * SHAPE is the contract: a serial scan over a record's frames
    * inside the partition iterator (state = previous frame's
    * statistics only), emitting one narrow summary row per asset;
    * frames never leave the executor, and at 100 TB the scan
    * parallelizes per-asset, not per-frame.
    *
    * Exactness: the mean comparison is cleared of division —
    * |mean_f − mean_p| > τ  ⇔  |s_f·L_p − s_p·L_f| > τ·L_f·L_p —
    * so both engines compare exact BIGINTs (ASCII corpus ⇒ byte sums
    * = code-point sums). The per-doc summary carries n_frames,
    * n_cuts, the first cut index (scene-1 length) and the cut-index
    * sum (certifies WHICH frames cut, not just how many). */
  def mmChunkCut(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = mediaRecords(spark, dir).as[MediaRecord]
    ds.mapPartitions { records =>
      records.map { r =>
        val n = r.payload.length
        val nFrames = (n + FrameBytes - 1) / FrameBytes
        var prevS = 0L
        var prevL = 0L
        var nCuts = 0L
        var firstCut = -1L
        var cutSum = 0L
        var f = 0
        while (f < nFrames) {
          val lo = f * FrameBytes
          val hi = math.min(n, lo + FrameBytes)
          var s = 0L
          var i = lo
          while (i < hi) { s += (r.payload(i) & 0xff); i += 1 }
          val L = (hi - lo).toLong
          if (f > 0 && math.abs(s * prevL - prevS * L) > SceneTau * L * prevL) {
            nCuts += 1
            cutSum += f
            if (firstCut < 0) firstCut = f
          }
          prevS = s; prevL = L; f += 1
        }
        (r.doc_id, nFrames.toLong, nCuts,
          if (firstCut < 0) None else Some(firstCut), cutSum)
      }
    }.toDF("doc_id", "n_frames", "n_cuts", "first_cut", "cut_idx_sum")
      .orderBy(col("doc_id"))
  }

  val mmChunkCutSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, text, strlen(text) AS n,
       |    (strlen(text) + ${FrameBytes - 1}) // $FrameBytes AS n_frames
       |  FROM documents),
       |frames AS (
       |  SELECT doc_id, CAST(f AS BIGINT) AS fi, n_frames,
       |    CAST(list_aggregate(list_transform(
       |      range(1, LEAST(n, (f+1)*$FrameBytes) - f*$FrameBytes + 1),
       |      i -> ascii(substr(substr(text, f*$FrameBytes + 1, $FrameBytes), i, 1))),
       |      'sum') AS BIGINT) AS s,
       |    CAST(LEAST(n, (f+1)*$FrameBytes) - f*$FrameBytes AS BIGINT) AS L
       |  FROM b, UNNEST(RANGE(0, n_frames)) AS r(f)),
       |d AS (
       |  SELECT doc_id, fi, n_frames, s, L,
       |    lag(s) OVER w AS ps, lag(L) OVER w AS pL
       |  FROM frames WINDOW w AS (PARTITION BY doc_id ORDER BY fi)),
       |cuts AS (
       |  SELECT doc_id, fi,
       |    ps IS NOT NULL AND ABS(s*pL - ps*L) > $SceneTau*L*pL AS cut
       |  FROM d),
       |agg AS (
       |  SELECT doc_id,
       |    CAST(COUNT(*) FILTER (WHERE cut) AS BIGINT) AS n_cuts,
       |    MIN(fi) FILTER (WHERE cut) AS first_cut,
       |    CAST(COALESCE(SUM(fi) FILTER (WHERE cut), 0) AS BIGINT)
       |      AS cut_idx_sum
       |  FROM cuts GROUP BY doc_id)
       |-- LEFT JOIN from the asset table: a 0-byte payload has no frame
       |-- rows to aggregate but must still REPORT (n_frames=0, no cuts)
       |-- — the fuzz sweep's empty-document find; Spark's per-record
       |-- map emits unconditionally and the oracle must agree
       |SELECT b.doc_id, CAST(b.n_frames AS BIGINT) AS n_frames,
       |  CAST(COALESCE(a.n_cuts, 0) AS BIGINT) AS n_cuts,
       |  a.first_cut,
       |  CAST(COALESCE(a.cut_idx_sum, 0) AS BIGINT) AS cut_idx_sum
       |FROM b LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin

  // ------------------------------------------ REAL JDK decode (r9)
  // The decode stubs above stand in for codec-dependent formats the
  // container can't decode; WAV (javax.sound.sampled) and PNG
  // (javax.imageio) need NO external codecs, so these two gates do
  // the genuine round trip: deterministic samples/pixels → the JDK's
  // real container WRITER → opaque bytes → the JDK's real PARSER →
  // statistics. The oracle computes the same statistics from the
  // generating formula alone — any header, endianness, compression
  // or color-model mistake in the byte path breaks the hash. The
  // plumbing contract matches the stubs: bytes never leave the
  // partition, only narrow stat rows shuffle.

  /** Max samples per clip / max image edge (bounds the oracle's
    * closed-form range join). */
  private val WavMaxN = 128
  private val PngMaxW = 16
  private val PngMaxH = 13

  def mmWavDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // NOT docIdsPar (opt r13): javax.sound's provider registry
    // serializes concurrent getAudioInputStream calls — the measured
    // parallel round trip is ~2x SLOWER than serial (CodecBench micro:
    // 0.26 s serial vs 0.51 s parallel for 5k clips), so spreading this
    // gate across cores is pure contention. The image gates scale once
    // the ImageIO disk cache is off; audio does not.
    val ids = t(spark, dir, "documents").select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      import javax.sound.sampled._
      import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
      it.map { id =>
        val n = (64 + id % 64).toInt
        val samples = Array.tabulate(n)(i =>
          ((id * 31 + i.toLong * 17) % 2001 - 1000).toShort)
        // ENCODE through the JDK's WAV writer (PCM_SIGNED 16-bit LE mono)
        val fmt = new AudioFormat(8000f, 16, 1, true, false)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          pcm(2 * i) = (samples(i) & 0xff).toByte
          pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
          i += 1
        }
        val baos = new ByteArrayOutputStream()
        AudioSystem.write(new AudioInputStream(
          new ByteArrayInputStream(pcm), fmt, n.toLong),
          AudioFileFormat.Type.WAVE, baos)
        val bytes = baos.toByteArray
        val riffOk = if (bytes.length >= 12 &&
          bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
          bytes(10) == 'V' && bytes(11) == 'E') 1L else 0L
        // DECODE through the JDK's WAV parser; trust ONLY its output
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        val f = in.getFormat
        require(f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
          !f.isBigEndian, s"unexpected decoded format: $f")
        val data = in.readAllBytes()
        val m = data.length / 2
        var sum = 0L; var energy = 0L; var peak = 0L
        var j = 0
        while (j < m) {
          val s = (data(2 * j + 1).toInt << 8) | (data(2 * j) & 0xff)
          sum += s; energy += s.toLong * s
          peak = math.max(peak, math.abs(s.toLong))
          j += 1
        }
        (id, m.toLong, riffOk, sum, energy, peak)
      }
    }.toDF("doc_id", "n_samples", "riff_ok", "sum_samples", "energy", "peak")
      .orderBy(col("doc_id"))
  }

  val mmWavDecodeSql: String =
    s"""WITH ids AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
       |g AS (SELECT UNNEST(RANGE(0, $WavMaxN)) AS i),
       |s AS (SELECT doc_id, ((doc_id * 31 + i * 17) % 2001 - 1000) AS smp
       |      FROM ids JOIN g ON g.i < ids.n)
       |SELECT doc_id, COUNT(*) AS n_samples, CAST(1 AS BIGINT) AS riff_ok,
       |  CAST(SUM(smp) AS BIGINT) AS sum_samples,
       |  CAST(SUM(smp * smp) AS BIGINT) AS energy,
       |  CAST(MAX(ABS(smp)) AS BIGINT) AS peak
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def mmPngDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = docIdsPar(spark, dir).as[Long]
    ids.mapPartitions { it =>
      imageIoNoDiskCache()
      import java.awt.image.BufferedImage
      import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
      import javax.imageio.ImageIO
      it.map { id =>
        val w = (8 + id % 8).toInt
        val h = (8 + id % 5).toInt
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // floorMod, not %: Scala % keeps the dividend's sign, so a
            // negative doc_id would yield negative channels that
            // sign-extend through (r<<16)|(g<<8)|b and corrupt higher
            // bytes — floorMod keeps the gate total over int64 doc_ids
            // (oracle mirrors with ((v % 256) + 256) % 256)
            val r = Math.floorMod(id + 3L * x + 5L * y, 256L).toInt
            val g = Math.floorMod(2L * id + 7L * x + y, 256L).toInt
            val b = Math.floorMod(11L * x + 13L * y, 256L).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val baos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", baos)
        val bytes = baos.toByteArray
        val sig = if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
          bytes(2) == 'N' && bytes(3) == 'G') 1L else 0L
        val dec = ImageIO.read(new ByteArrayInputStream(bytes))
        var sr = 0L; var sg = 0L; var sb = 0L
        y = 0
        while (y < dec.getHeight) {
          var x = 0
          while (x < dec.getWidth) {
            val p = dec.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val corner = dec.getRGB(dec.getWidth - 1, dec.getHeight - 1) & 0xffffff
        (id, sig, dec.getWidth.toLong, dec.getHeight.toLong,
          sr, sg, sb, corner.toLong)
      }
    }.toDF("doc_id", "png_sig", "w", "h", "sum_r", "sum_g", "sum_b",
        "corner_rgb")
      .orderBy(col("doc_id"))
  }

  /** The oracle reduces doc_id mod 256 BEFORE any addition (`did`):
    * (doc_id + 3x + 5y) overflows int64 at the edges — DuckDB raises
    * where Scala wraps — and the congruence (did + 3x + 5y) ≡
    * (doc_id + 3x + 5y) (mod 256) makes the reduced form exact. The
    * Spark side needs no guard: floorMod of a WRAPPED int64 linear
    * combination still equals the true mathematical mod because 256
    * divides 2⁶⁴. w/h stay on raw doc_id % 8 / % 5 (sign-preserving
    * identically in both engines, and addition-free so no overflow). */
  val mmPngDecodeSql: String =
    s"""WITH ids AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
       |  (doc_id % 256 + 256) % 256 AS did
       |  FROM documents),
       |gx AS (SELECT UNNEST(RANGE(0, $PngMaxW)) AS x),
       |gy AS (SELECT UNNEST(RANGE(0, $PngMaxH)) AS y),
       |px AS (
       |  SELECT doc_id, w, h, did,
       |    ((did + 3 * x + 5 * y) % 256 + 256) % 256 AS r,
       |    ((2 * did + 7 * x + y) % 256 + 256) % 256 AS g,
       |    ((11 * x + 13 * y) % 256 + 256) % 256 AS b
       |  FROM ids JOIN gx ON gx.x < ids.w JOIN gy ON gy.y < ids.h)
       |SELECT doc_id, CAST(1 AS BIGINT) AS png_sig,
       |  CAST(MIN(w) AS BIGINT) AS w, CAST(MIN(h) AS BIGINT) AS h,
       |  CAST(SUM(r) AS BIGINT) AS sum_r,
       |  CAST(SUM(g) AS BIGINT) AS sum_g,
       |  CAST(SUM(b) AS BIGINT) AS sum_b,
       |  CAST(MIN(((did + 3 * (w - 1) + 5 * (h - 1)) % 256 + 256) % 256) * 65536
       |    + MIN(((2 * did + 7 * (w - 1) + (h - 1)) % 256 + 256) % 256) * 256
       |    + MIN(((11 * (w - 1) + 13 * (h - 1)) % 256 + 256) % 256) AS BIGINT) AS corner_rgb
       |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** BMP round trip — the second lossless imageio path (r10, VERDICT
    * r9 next #3): same generating pixels as [[mmPngDecode]] but
    * written through the JDK's BMP encoder (BI_RGB 24-bit, BOTTOM-UP
    * row order, 4-byte row padding) and re-parsed — a genuinely
    * different container/byte layout than PNG's zlib-filtered
    * top-down scanlines, sharing the same closed-form oracle family.
    * A row-order, padding, or channel-order mistake in either
    * direction of the codec breaks the per-channel sums. */
  def mmBmpDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = docIdsPar(spark, dir).as[Long]
    ids.mapPartitions { it =>
      imageIoNoDiskCache()
      import java.awt.image.BufferedImage
      import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
      import javax.imageio.ImageIO
      it.map { id =>
        val w = (8 + id % 8).toInt
        val h = (8 + id % 5).toInt
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = Math.floorMod(id + 3L * x + 5L * y, 256L).toInt
            val g = Math.floorMod(2L * id + 7L * x + y, 256L).toInt
            val b = Math.floorMod(11L * x + 13L * y, 256L).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val baos = new ByteArrayOutputStream()
        ImageIO.write(img, "bmp", baos)
        val bytes = baos.toByteArray
        val sig = if (bytes(0) == 'B' && bytes(1) == 'M') 1L else 0L
        val dec = ImageIO.read(new ByteArrayInputStream(bytes))
        var sr = 0L; var sg = 0L; var sb = 0L
        y = 0
        while (y < dec.getHeight) {
          var x = 0
          while (x < dec.getWidth) {
            val p = dec.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val corner = dec.getRGB(dec.getWidth - 1, dec.getHeight - 1) & 0xffffff
        (id, sig, dec.getWidth.toLong, dec.getHeight.toLong,
          sr, sg, sb, corner.toLong)
      }
    }.toDF("doc_id", "bmp_sig", "w", "h", "sum_r", "sum_g", "sum_b",
        "corner_rgb")
      .orderBy(col("doc_id"))
  }

  /** Same closed-form oracle family as PNG (the pixels are identical —
    * only the container differs), with the BMP signature constant. */
  val mmBmpDecodeSql: String =
    mmPngDecodeSql.replace("AS png_sig", "AS bmp_sig")

  /** GIF round trip (r11, VERDICT r10 next #5 — the third lossless
    * imageio container, replacing the retired arithmetic stand-ins):
    * grayscale pattern → the JDK's REAL GIF encoder (LZW-compressed,
    * palette-indexed — a genuinely different byte layout from PNG's
    * zlib scanlines and BMP's raw bottom-up rows) → "GIF"-signature-
    * checked bytes → the real GIF parser. Grayscale keeps the round
    * trip EXACT: a frame has ≤ 180 pixels, so every distinct gray
    * level fits the 256-entry palette losslessly (probed exhaustively
    * over all (mod 256, mod 8, mod 5) residue classes in both sign
    * regimes plus the int64 edges — zero error on every pixel,
    * including the short dims negative ids produce). Interlace is
    * explicitly disabled — see the in-body note on the JDK
    * short-image interlace scramble the fuzz sweep caught. A
    * palette-construction, LZW, or row-order mistake in either codec
    * direction breaks the gray sum. */
  def mmGifDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = docIdsPar(spark, dir).as[Long]
    ids.mapPartitions { it =>
      imageIoNoDiskCache()
      import java.awt.image.BufferedImage
      import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
      import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
      it.map { id =>
        val w = (8 + id % 8).toInt
        val h = (8 + id % 5).toInt
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.getRaster.setSample(x, y, 0,
              Math.floorMod(id + 3L * x + 5L * y, 256L).toInt)
            x += 1
          }
          y += 1
        }
        // progressive (= GIF interlace) must be EXPLICITLY disabled:
        // the convenience ImageIO.write path interlaces, and the JDK
        // writer/reader pair scrambles row order on images shorter
        // than a full interlace cycle (h ≤ 4 — exactly the dims
        // negative doc_ids produce; found by the r11 fuzz sweep:
        // decoded rows permuted, one row dropped). With interlace off
        // the round trip is exact on every pixel — probed over all
        // (id mod 256, mod 8, mod 5) classes, both signs, + edges.
        val writer = ImageIO.getImageWritersByFormatName("gif").next()
        val param = writer.getDefaultWriteParam
        param.setProgressiveMode(ImageWriteParam.MODE_DISABLED)
        val baos = new ByteArrayOutputStream()
        val ios = ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
        ios.close(); writer.dispose()
        val bytes = baos.toByteArray
        val sig = if (bytes.length >= 6 && bytes(0) == 'G' &&
          bytes(1) == 'I' && bytes(2) == 'F') 1L else 0L
        val dec = ImageIO.read(new ByteArrayInputStream(bytes))
        var sum = 0L
        y = 0
        while (y < dec.getHeight) {
          var x = 0
          while (x < dec.getWidth) {
            sum += dec.getRGB(x, y) & 0xff
            x += 1
          }
          y += 1
        }
        val corner = dec.getRGB(dec.getWidth - 1, dec.getHeight - 1) & 0xff
        (id, sig, dec.getWidth.toLong, dec.getHeight.toLong, sum,
          corner.toLong)
      }
    }.toDF("doc_id", "gif_sig", "w", "h", "sum_gray", "corner_gray")
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------- animated (multi-frame) GIF
  private val GifSceneTau = 8L

  /** Encode K deterministic grayscale frames as ONE ANIMATED GIF
    * (writer sequence API, interlace explicitly off — PARITY §38's
    * h ≤ 4 scramble applies per frame), then decode every frame back
    * by INDEX through the JDK reader and return the decoded pixel
    * sums. This is the multi-frame real-decode core both
    * [[mmGifFrameSample]] and [[mmGifSceneCut]] share (VERDICT r11
    * next #3: the byte-chunk `mm_framesample`/`mm_scene_cut` treat
    * payload slices as "frames"; these twins compute over frames a
    * real codec actually decoded). Frame f's pattern adds an 11·f
    * drift to the still-image family's gray ramp, so per-frame sums
    * have the same closed form the oracle computes.
    *
    * Scale shape: encode+decode never leave the partition iterator —
    * one record in, one row of per-frame sums out; no shuffle sees
    * pixel data. */
  private def gifFramesRoundTrip(id: Long): (Long, Int, Int, Array[Long]) = {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val w = (8 + id % 8).toInt
    val h = (8 + id % 5).toInt
    val k = (3 + Math.floorMod(id, 4L)).toInt
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DISABLED)
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < k) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.getRaster.setSample(x, y, 0,
            Math.floorMod(id + 3L * x + 5L * y + 11L * f, 256L).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new IIOImage(img, null, null), param)
      f += 1
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    val bytes = baos.toByteArray
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    reader.setInput(iis)
    val nF = reader.getNumImages(true)
    val sums = (0 until nF).map { i =>
      val dec = reader.read(i)
      var s = 0L
      var y = 0
      while (y < dec.getHeight) {
        var x = 0
        while (x < dec.getWidth) { s += dec.getRGB(x, y) & 0xff; x += 1 }
        y += 1
      }
      s
    }.toArray
    reader.dispose(); iis.close()
    (nF.toLong, w, h, sums)
  }

  /** Frame sampling over REAL decoded frames: container frame count
    * (the reader's own index scan, not the generator's K) plus the
    * decoded pixel sums of the first / middle / last frame — the
    * stride-sample a video pipeline keeps. Equality with the oracle's
    * closed form proves every sampled frame decoded exactly. */
  def mmGifFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = docIdsPar(spark, dir).as[Long]
    ids.mapPartitions { it =>
      imageIoNoDiskCache()
      it.map { id =>
        val (nF, _, _, sums) = gifFramesRoundTrip(id)
        val n = sums.length
        (id, nF, sums(0), sums(n / 2), sums(n - 1))
      }
    }.toDF("doc_id", "n_frames", "sum_first", "sum_mid", "sum_last")
      .orderBy(col("doc_id"))
  }

  val mmGifFrameSampleSql: String =
    s"""WITH ids AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
       |  (doc_id % 256 + 256) % 256 AS did,
       |  3 + (doc_id % 4 + 4) % 4 AS k
       |  FROM documents),
       |gx AS (SELECT UNNEST(RANGE(0, $PngMaxW)) AS x),
       |gy AS (SELECT UNNEST(RANGE(0, $PngMaxH)) AS y),
       |fs AS (
       |  SELECT doc_id, k, f,
       |    SUM(((did + 3 * x + 5 * y + 11 * f) % 256 + 256) % 256) AS s
       |  FROM ids JOIN gx ON gx.x < ids.w JOIN gy ON gy.y < ids.h,
       |       UNNEST(RANGE(0, k)) AS r(f)
       |  GROUP BY doc_id, k, f)
       |SELECT doc_id, CAST(MIN(k) AS BIGINT) AS n_frames,
       |  CAST(MIN(CASE WHEN f = 0 THEN s END) AS BIGINT) AS sum_first,
       |  CAST(MIN(CASE WHEN f = k // 2 THEN s END) AS BIGINT) AS sum_mid,
       |  CAST(MIN(CASE WHEN f = k - 1 THEN s END) AS BIGINT) AS sum_last
       |FROM fs GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Scene-cut over REAL decoded frames: adjacent-frame decoded-sum
    * jumps against an integer per-pixel threshold (|s_f − s_{f−1}| >
    * $GifSceneTau·w·h ⇒ cut). The 11·f drift advances every pixel by
    * 11 per frame until it WRAPS mod 256 — wraps drop the sum by
    * 256 per wrapped pixel, so frames where a band of pixels crosses
    * 255 fire the detector: deterministic, engine-exact cut
    * positions. Same output shape as the byte-chunk [[mmChunkCut]]. */
  def mmGifSceneCut(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = docIdsPar(spark, dir).as[Long]
    ids.mapPartitions { it =>
      imageIoNoDiskCache()
      it.map { id =>
        val (nF, w, h, sums) = gifFramesRoundTrip(id)
        var nCuts = 0L
        var firstCut = -1L
        var cutSum = 0L
        var f = 1
        while (f < sums.length) {
          if (math.abs(sums(f) - sums(f - 1)) > GifSceneTau * w * h) {
            nCuts += 1; cutSum += f
            if (firstCut < 0) firstCut = f
          }
          f += 1
        }
        (id, nF, nCuts, if (firstCut < 0) None else Some(firstCut), cutSum)
      }
    }.toDF("doc_id", "n_frames", "n_cuts", "first_cut", "cut_idx_sum")
      .orderBy(col("doc_id"))
  }

  val mmGifSceneCutSql: String =
    s"""WITH ids AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
       |  (doc_id % 256 + 256) % 256 AS did,
       |  3 + (doc_id % 4 + 4) % 4 AS k
       |  FROM documents),
       |gx AS (SELECT UNNEST(RANGE(0, $PngMaxW)) AS x),
       |gy AS (SELECT UNNEST(RANGE(0, $PngMaxH)) AS y),
       |fs AS (
       |  SELECT doc_id, w, h, k, f,
       |    SUM(((did + 3 * x + 5 * y + 11 * f) % 256 + 256) % 256) AS s
       |  FROM ids JOIN gx ON gx.x < ids.w JOIN gy ON gy.y < ids.h,
       |       UNNEST(RANGE(0, k)) AS r(f)
       |  GROUP BY doc_id, w, h, k, f),
       |d AS (
       |  SELECT doc_id, w, h, k, f, s, lag(s) OVER w2 AS ps
       |  FROM fs WINDOW w2 AS (PARTITION BY doc_id ORDER BY f)),
       |cuts AS (
       |  SELECT doc_id, k, f
       |  FROM d WHERE ps IS NOT NULL AND ABS(s - ps) > $GifSceneTau * w * h)
       |SELECT i.doc_id, CAST(i.k AS BIGINT) AS n_frames,
       |  CAST(COUNT(c.f) AS BIGINT) AS n_cuts,
       |  CAST(MIN(c.f) AS BIGINT) AS first_cut,
       |  CAST(COALESCE(SUM(c.f), 0) AS BIGINT) AS cut_idx_sum
       |FROM ids i LEFT JOIN cuts c ON i.doc_id = c.doc_id
       |GROUP BY i.doc_id, i.k ORDER BY i.doc_id""".stripMargin

  /** Single-channel member of the PNG/BMP closed-form family — the
    * generating gray is the PNG red channel, with the same wrap-safe
    * mod-reduced `did` (256 | 2⁶⁴ exactness note at
    * [[mmPngDecodeSql]]). */
  val mmGifDecodeSql: String =
    s"""WITH ids AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
       |  (doc_id % 256 + 256) % 256 AS did
       |  FROM documents),
       |gx AS (SELECT UNNEST(RANGE(0, $PngMaxW)) AS x),
       |gy AS (SELECT UNNEST(RANGE(0, $PngMaxH)) AS y),
       |px AS (
       |  SELECT doc_id, w, h, did,
       |    ((did + 3 * x + 5 * y) % 256 + 256) % 256 AS g
       |  FROM ids JOIN gx ON gx.x < ids.w JOIN gy ON gy.y < ids.h)
       |SELECT doc_id, CAST(1 AS BIGINT) AS gif_sig,
       |  CAST(MIN(w) AS BIGINT) AS w, CAST(MIN(h) AS BIGINT) AS h,
       |  CAST(SUM(g) AS BIGINT) AS sum_gray,
       |  CAST(MIN(((did + 3 * (w - 1) + 5 * (h - 1)) % 256 + 256) % 256)
       |    AS BIGINT) AS corner_gray
       |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** JPEG round trip (r10): grayscale pattern → the JDK's REAL JPEG
    * encoder at quality 1.0 → SOI/EOI-checked bytes → the real JPEG
    * parser. JPEG is LOSSY, so unlike PNG/BMP the decoded pixel sums
    * have no closed form; what IS exact — and what the oracle checks —
    * is the container round trip (signature, decoded dimensions) plus
    * a measured error bound: at quality 1.0 the quantization tables
    * are all-1s and the DCT round trip is within ±1 of the source on
    * EVERY pixel (probed exhaustively over the full input residue
    * space — all (id mod 256, id mod 8, id mod 5) classes for BOTH
    * sign regimes plus the int64 edge ids, covering the 1-pixel-wide
    * dims negative ids produce — so the bound holds for all int64
    * doc_ids, not just the fixtures; fuzz-swept with edge ids).
    * Grayscale (TYPE_BYTE_GRAY single-component) sidesteps chroma
    * subsampling, the lossy step that would break even the bound. */
  def mmJpegDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = docIdsPar(spark, dir).as[Long]
    ids.mapPartitions { it =>
      imageIoNoDiskCache()
      import java.awt.image.BufferedImage
      import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
      import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
      it.map { id =>
        val w = (8 + id % 8).toInt
        val h = (8 + id % 5).toInt
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.getRaster.setSample(x, y, 0,
              Math.floorMod(id + 3L * x + 5L * y, 256L).toInt)
            x += 1
          }
          y += 1
        }
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(1.0f)
        val baos = new ByteArrayOutputStream()
        val ios = ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
        ios.close(); writer.dispose()
        val bytes = baos.toByteArray
        val n = bytes.length
        val sig = if (n >= 4 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xff) == 0xd8 && (bytes(n - 2) & 0xff) == 0xff &&
          (bytes(n - 1) & 0xff) == 0xd9) 1L else 0L
        val dec = ImageIO.read(new ByteArrayInputStream(bytes))
        var maxErr = 0
        y = 0
        while (y < dec.getHeight) {
          var x = 0
          while (x < dec.getWidth) {
            val e = math.abs(dec.getRaster.getSample(x, y, 0) -
              Math.floorMod(id + 3L * x + 5L * y, 256L).toInt)
            if (e > maxErr) maxErr = e
            x += 1
          }
          y += 1
        }
        (id, sig, dec.getWidth.toLong, dec.getHeight.toLong,
          dec.getWidth.toLong * dec.getHeight, if (maxErr <= 1) 1L else 0L)
      }
    }.toDF("doc_id", "jpeg_sig", "w", "h", "n_px", "err_le_1")
      .orderBy(col("doc_id"))
  }

  val mmJpegDecodeSql: String =
    """SELECT doc_id, CAST(1 AS BIGINT) AS jpeg_sig,
      |  CAST(8 + doc_id % 8 AS BIGINT) AS w,
      |  CAST(8 + doc_id % 5 AS BIGINT) AS h,
      |  CAST((8 + doc_id % 8) * (8 + doc_id % 5) AS BIGINT) AS n_px,
      |  CAST(1 AS BIGINT) AS err_le_1
      |FROM documents ORDER BY doc_id""".stripMargin

  /** REAL 2-D bilinear resize over really-decoded pixels (r10,
    * replacing the 1-D byte-bucket arithmetic of [[mmResample1d]] as
    * the production path): the PNG bytes from the real encoder are
    * re-decoded by the real parser, then the RGB image is upsampled
    * 2× (rw = 2w−1, rh = 2h−1, output (x,y) samples source position
    * (x/2, y/2)) with an EXPLICIT bilinear kernel — weights are
    * quarter-integers at half-pixel positions, so 4·interpolant is an
    * exact integer and the per-channel sums are closed-form oracle-
    * able. Java2D's own AffineTransformOp was probed and rejected for
    * this gate: TYPE_BYTE_GRAY routes through a linear→sRGB colorspace
    * conversion and even TYPE_INT_RGB uses opaque fixed-point edge
    * weights (10,20→12, not the 15 of textbook bilinear), so its
    * arithmetic cannot be mirrored in an oracle — the kernel here IS
    * the standard definition a production resampler implements. */
  def mmResizeReal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = docIdsPar(spark, dir).as[Long]
    ids.mapPartitions { it =>
      imageIoNoDiskCache()
      import java.awt.image.BufferedImage
      import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
      import javax.imageio.ImageIO
      it.map { id =>
        val w = (8 + id % 8).toInt
        val h = (8 + id % 5).toInt
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = Math.floorMod(id + 3L * x + 5L * y, 256L).toInt
            val g = Math.floorMod(2L * id + 7L * x + y, 256L).toInt
            val b = Math.floorMod(11L * x + 13L * y, 256L).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val baos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", baos)
        val dec = ImageIO.read(new ByteArrayInputStream(baos.toByteArray))
        val rw = 2 * w - 1
        val rh = 2 * h - 1
        // 4·bilinear at source position (x/2, y/2): even coords hit a
        // pixel (weight 1), one odd coord averages 2 neighbors (½,½),
        // both odd average 4 (¼ each) — all exact in integers
        def ch(p: Int, c: Int): Long = ((p >> c) & 0xff).toLong
        var s4r = 0L; var s4g = 0L; var s4b = 0L
        var ry = 0
        while (ry < rh) {
          var rx = 0
          while (rx < rw) {
            val x0 = rx / 2; val y0 = ry / 2
            val x1 = (rx + 1) / 2; val y1 = (ry + 1) / 2
            val p00 = dec.getRGB(x0, y0); val p10 = dec.getRGB(x1, y0)
            val p01 = dec.getRGB(x0, y1); val p11 = dec.getRGB(x1, y1)
            s4r += ch(p00, 16) + ch(p10, 16) + ch(p01, 16) + ch(p11, 16)
            s4g += ch(p00, 8) + ch(p10, 8) + ch(p01, 8) + ch(p11, 8)
            s4b += ch(p00, 0) + ch(p10, 0) + ch(p01, 0) + ch(p11, 0)
            rx += 1
          }
          ry += 1
        }
        val pc = dec.getRGB(w - 1, h - 1)
        (id, rw.toLong, rh.toLong, s4r, s4g, s4b, 4L * ch(pc, 16))
      }
    }.toDF("doc_id", "rw", "rh", "sum4_r", "sum4_g", "sum4_b", "corner4_r")
      .orderBy(col("doc_id"))
  }

  /** Closed form: Σ over the resized grid of the 4-neighbor sums is a
    * range join over resized coordinates with the same floor/ceil
    * index arithmetic; pixel values come from the generating formulas
    * (the PNG round trip is bit-exact, proven by `mm_png_decode`). */
  val mmResizeRealSql: String =
    s"""WITH ids AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
       |  (doc_id % 256 + 256) % 256 AS did
       |  FROM documents),
       |gx AS (SELECT UNNEST(RANGE(0, ${2 * PngMaxW - 1})) AS rx),
       |gy AS (SELECT UNNEST(RANGE(0, ${2 * PngMaxH - 1})) AS ry),
       |cells AS (
       |  SELECT doc_id, w, h, did, rx // 2 AS x0, ry // 2 AS y0,
       |    (rx + 1) // 2 AS x1, (ry + 1) // 2 AS y1
       |  FROM ids JOIN gx ON gx.rx < 2 * ids.w - 1
       |            JOIN gy ON gy.ry < 2 * ids.h - 1),
       |terms AS (
       |  SELECT doc_id, w, h, did,
       |    ((did + 3 * x0 + 5 * y0) % 256 + 256) % 256
       |      + ((did + 3 * x1 + 5 * y0) % 256 + 256) % 256
       |      + ((did + 3 * x0 + 5 * y1) % 256 + 256) % 256
       |      + ((did + 3 * x1 + 5 * y1) % 256 + 256) % 256 AS r4,
       |    ((2 * did + 7 * x0 + y0) % 256 + 256) % 256
       |      + ((2 * did + 7 * x1 + y0) % 256 + 256) % 256
       |      + ((2 * did + 7 * x0 + y1) % 256 + 256) % 256
       |      + ((2 * did + 7 * x1 + y1) % 256 + 256) % 256 AS g4,
       |    ((11 * x0 + 13 * y0) % 256 + 256) % 256
       |      + ((11 * x1 + 13 * y0) % 256 + 256) % 256
       |      + ((11 * x0 + 13 * y1) % 256 + 256) % 256
       |      + ((11 * x1 + 13 * y1) % 256 + 256) % 256 AS b4
       |  FROM cells)
       |SELECT doc_id, CAST(MIN(2 * w - 1) AS BIGINT) AS rw,
       |  CAST(MIN(2 * h - 1) AS BIGINT) AS rh,
       |  CAST(SUM(r4) AS BIGINT) AS sum4_r,
       |  CAST(SUM(g4) AS BIGINT) AS sum4_g,
       |  CAST(SUM(b4) AS BIGINT) AS sum4_b,
       |  CAST(4 * (((MIN(did) + 3 * (MIN(w) - 1) + 5 * (MIN(h) - 1)) % 256
       |    + 256) % 256) AS BIGINT) AS corner4_r
       |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------ perceptual-hash image dedup
  private val PhashHammingMax = 4

  /** Image DEDUP by perceptual hash — the multimodal twin of
    * `dedup_simhash_pairs`, and the operator an image-corpus curation
    * pipeline runs where text runs MinHash: decode → average-hash
    * (8×8 grid of the decoded pixels, each bit = sample above the
    * grid mean) → banded Hamming join. Images are formula-generated
    * per doc (16 content classes × 2 variants, the variant perturbing
    * one corner pixel — so the corpus REALLY contains exact dups,
    * near-dups a few bits apart, and unrelated pairs) and go through
    * the REAL PNG writer→parser round trip (bit-exact, proven by
    * `mm_png_decode`); the hash is computed from the DECODED pixels.
    *
    * Scale shape: decode + hash are partition-local (bytes never
    * leave the partition — the mm-family rule); only (doc_id, two
    * 32-bit hash halves) cross the shuffle. Candidates come from a
    * 4×16-bit band equi-join exactly like SimHash — never all-pairs —
    * and the exact popcount Hamming check runs on candidates only.
    * Pairs at distance ≤ [[PhashHammingMax]] survive. */
  def mmPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = docIdsPar(spark, dir).as[Long]
    val hashes = ids.mapPartitions { it =>
      imageIoNoDiskCache()
      import java.awt.image.BufferedImage
      import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
      import javax.imageio.ImageIO
      it.map { id =>
        // 16 content classes × 2 variants; all derived via floorMod
        // so the gate is total over int64 doc_ids (oracle mirrors
        // with ((x % 32) + 32) % 32 — and its // on the NON-NEGATIVE
        // cls32 agrees with Scala's truncating /)
        val cls32 = Math.floorMod(id, 32L).toInt
        val cls = cls32 % 16
        val delta = cls32 / 16
        val w = 8 + cls % 8
        val h = 8 + cls % 5
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // per-class multiplicative ramp — the mod-256 wraps give
            // each class a structurally DISTINCT threshold pattern (a
            // plain additive ramp made every class the same diagonal
            // split: measured 54k candidate pairs at 500 docs, i.e.
            // everything matched everything); the variant bumps the
            // (0,0) corner by 64
            val v = (((cls * 41 + 7) * (x + w * y)) % 256 +
              (if (x == 0 && y == 0) 64 * delta else 0)) % 256
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val baos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", baos)
        val dec = ImageIO.read(new ByteArrayInputStream(baos.toByteArray))
        // average hash over the 8×8 sample grid of DECODED pixels:
        // bit(i,j) = 64·sample > Σ samples (strict — ties are zeros
        // identically in both engines; integer-only arithmetic)
        val s = Array.ofDim[Long](8, 8)
        var ssum = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val sx = i * (w - 1) / 7
            val sy = j * (h - 1) / 7
            s(j)(i) = (dec.getRGB(sx, sy) & 0xff).toLong
            ssum += s(j)(i)
            i += 1
          }
          j += 1
        }
        var hLo = 0L; var hHi = 0L
        j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            if (64L * s(j)(i) > ssum) {
              val idx = j * 8 + i
              if (idx < 32) hLo |= 1L << idx else hHi |= 1L << (idx - 32)
            }
            i += 1
          }
          j += 1
        }
        (id, hHi, hLo)
      }
    }.toDF("doc_id", "h_hi", "h_lo")
    val bands = hashes.select(col("doc_id"), col("h_hi"), col("h_lo"),
      explode(expr(
        """array(
          |  struct(0L as b, h_lo % 65536 as bv),
          |  struct(1L as b, h_lo div 65536 as bv),
          |  struct(2L as b, h_hi % 65536 as bv),
          |  struct(3L as b, h_hi div 65536 as bv))""".stripMargin)).as("bd"))
      .select(col("doc_id"), col("h_hi"), col("h_lo"),
        col("bd.b").as("b"), col("bd.bv").as("bv"))
      // pin the band-join width (opt r14, VERDICT r13 next #4): the
      // band rows entering the self-join are a few hundred KB, so AQE
      // coalesced the join's shuffle to ONE partition and the
      // quadratic candidate expansion + Hamming check ran serially
      // (measured: a 1-task 1.5 s stage, the gate's dominant cost).
      // The expansion's output is invisible to AQE's pre-shuffle byte
      // estimate; an explicit numbered repartition on the join keys
      // replaces the planner's own exchange (same exchange count, the
      // self-join reuses it) and is exempt from coalescing, so the
      // expansion runs cluster-wide at any scale.
      .repartition(spark.sparkContext.defaultParallelism, col("b"), col("bv"))
    val cand = bands.as("x")
      .join(bands.as("y").hint("merge"), col("x.b") === col("y.b") &&
        col("x.bv") === col("y.bv") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.h_hi").as("ha_hi"), col("x.h_lo").as("ha_lo"),
        col("y.h_hi").as("hb_hi"), col("y.h_lo").as("hb_lo"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        (bit_count(expr("ha_hi ^ hb_hi")) +
          bit_count(expr("ha_lo ^ hb_lo"))).cast("bigint").as("hamming"))
      .filter(col("hamming") <= PhashHammingMax)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Closed-form oracle: the PNG round trip is bit-exact, so samples
    * come straight from the generating ramp; the hash, bands and
    * popcount Hamming reproduce in integer SQL (xor(a,b) — DuckDB's
    * `^` is POWER; sums cast back from HUGEINT before xor). */
  val mmPhashDedupSql: String =
    s"""WITH cfg AS (
       |  SELECT doc_id,
       |    ((doc_id % 32) + 32) % 32 % 16 AS cls,
       |    ((doc_id % 32) + 32) % 32 // 16 AS delta,
       |    8 + (((doc_id % 32) + 32) % 32 % 16) % 8 AS w,
       |    8 + (((doc_id % 32) + 32) % 32 % 16) % 5 AS h
       |  FROM documents),
       |gi AS (SELECT UNNEST(RANGE(0, 8)) AS i),
       |gj AS (SELECT UNNEST(RANGE(0, 8)) AS j),
       |samp AS (
       |  SELECT doc_id, i, j,
       |    (((cls * 41 + 7) * ((i * (w - 1) // 7) + w * (j * (h - 1) // 7)))
       |       % 256
       |      + CASE WHEN i * (w - 1) // 7 = 0 AND j * (h - 1) // 7 = 0
       |             THEN 64 * delta ELSE 0 END) % 256 AS s
       |  FROM cfg, gi, gj),
       |sums AS (SELECT doc_id, SUM(s) AS ssum FROM samp GROUP BY doc_id),
       |bits AS (
       |  SELECT s.doc_id,
       |    CAST(COALESCE(SUM(CASE WHEN 64 * s.s > m.ssum AND j * 8 + i < 32
       |      THEN 1::BIGINT << (j * 8 + i) ELSE 0 END), 0) AS BIGINT) AS h_lo,
       |    CAST(COALESCE(SUM(CASE WHEN 64 * s.s > m.ssum AND j * 8 + i >= 32
       |      THEN 1::BIGINT << (j * 8 + i - 32) ELSE 0 END), 0) AS BIGINT) AS h_hi
       |  FROM samp s JOIN sums m USING (doc_id) GROUP BY s.doc_id),
       |bands AS (
       |  SELECT doc_id, h_hi, h_lo, b,
       |    CASE b WHEN 0 THEN h_lo % 65536 WHEN 1 THEN h_lo // 65536
       |           WHEN 2 THEN h_hi % 65536 ELSE h_hi // 65536 END AS bv
       |  FROM bits, (SELECT UNNEST(RANGE(0, 4)) AS b) bx),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b,
       |  CAST(bit_count(xor(a.h_hi, bb.h_hi))
       |    + bit_count(xor(a.h_lo, bb.h_lo)) AS BIGINT) AS hamming
       |FROM cand
       |JOIN bits a ON doc_a = a.doc_id
       |JOIN bits bb ON doc_b = bb.doc_id
       |WHERE bit_count(xor(a.h_hi, bb.h_hi))
       |  + bit_count(xor(a.h_lo, bb.h_lo)) <= $PhashHammingMax
       |ORDER BY doc_a, doc_b""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "mm_meta" -> ((mmMeta _, mmMetaSql)),
    "mm_wav_decode" -> ((mmWavDecode _, mmWavDecodeSql)),
    "mm_png_decode" -> ((mmPngDecode _, mmPngDecodeSql)),
    "mm_bmp_decode" -> ((mmBmpDecode _, mmBmpDecodeSql)),
    "mm_gif_decode" -> ((mmGifDecode _, mmGifDecodeSql)),
    "mm_gif_framesample" -> ((mmGifFrameSample _, mmGifFrameSampleSql)),
    "mm_gif_scene_cut" -> ((mmGifSceneCut _, mmGifSceneCutSql)),
    "mm_jpeg_decode" -> ((mmJpegDecode _, mmJpegDecodeSql)),
    "mm_resize_real" -> ((mmResizeReal _, mmResizeRealSql)),
    "mm_chunk_cut" -> ((mmChunkCut _, mmChunkCutSql)),
    "mm_chunk_features" -> ((mmChunkFeatures _, mmChunkFeaturesSql)),
    "mm_chunk_sample" -> ((mmChunkSample _, mmChunkSampleSql)),
    "mm_resample_1d" -> ((mmResample1d _, mmResample1dSql)),
    "mm_audio_energy" -> ((mmAudioEnergy _, mmAudioEnergySql)),
    "mm_binary_ingest" -> ((mmBinaryIngest _, mmBinaryIngestSql)),
    "mm_phash_dedup" -> ((mmPhashDedup _, mmPhashDedupSql)))
}
