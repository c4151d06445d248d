package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.D): media as an opaque `binary`
  * column + typed metadata, decoded/featurized in batched partition passes.
  *
  * The payloads carry REAL container headers (PNG IHDR / JPEG JFIF+SOF0 /
  * WAV RIFF, public formats, dimensions baked in) and `mm_media_stats`
  * decodes them back declaratively from the raw bytes — a genuine
  * header-level media reader, hash-oracled against the synthesis ground
  * truth. Only the PIXEL/SAMPLE decode is stubbed (`fakeDecode`, clearly
  * marked — the container ships no image/audio codecs); everything around
  * it — binary column synthesis, metadata schema, per-partition batching,
  * output schema — is real Spark plumbing and is what matters at 100 TB:
  * media bytes never hit the driver, decode is a narrow map over
  * partitions (mapPartitions is the Scala analogue of mapInPandas
  * batches), and feature vectors come out as columnar float arrays.
  */
object Multimodal {

  /** STUB decoder — deterministic fake. A real build links an image/audio
    * codec here and returns pixel/spectrogram features; the signature
    * (bytes + declared metadata → fixed-width float features) is the
    * contract the rest of the pipeline compiles against.
    */
  def fakeDecode(payload: Array[Byte], width: Int, height: Int): Array[Float] = {
    val dim = 8
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    val scale = if (payload.length > 0) dim.toFloat / payload.length else 0f
    var j = 0
    while (j < dim) { out(j) *= scale; j += 1 }
    out(0) += width / 10000.0f  // metadata participates deterministically
    out(1) += height / 10000.0f
    out
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  // ---- real container headers (public formats: PNG, JPEG/JFIF, WAV) ----

  /** Big-endian unsigned int as `n` binary bytes (the PNG/JPEG field
    * encoding) — pure codegen'd string/binary ops.
    */
  private def be(c: Column, n: Int): Column =
    unhex(lpad(hex(c.cast("long")), n * 2, "0"))

  /** Little-endian (the RIFF/WAV field encoding): per-byte hex, reversed. */
  private def le(c: Column, n: Int): Column =
    concat((0 until n).map { i =>
      unhex(lpad(hex(pmod((c.cast("long") / lit(1L << (8 * i))).cast("long"),
        lit(256L))), 2, "0"))
    }: _*)

  private def bin(bytes: Int*): Column = lit(bytes.map(_.toByte).toArray)

  /** JPEG COM-segment padding length: varies per doc so the SOF0 marker
    * sits at a NON-fixed offset — a correct reader must walk/scan
    * segments, which is exactly what the decode below proves it does.
    */
  private val jpegPad: Column = (col("doc_id") % 7).cast("int")

  /** Synthetic media table: payload = a REAL format header (dimensions
    * baked in, per the public container specs) + the document bytes as
    * body, plus the typed metadata struct a media parquet lake carries.
    * PNG: 8-byte signature + IHDR (width/height as 4-byte BE at fixed
    * offsets 17/21, bit depth 8, color type 6). JPEG: SOI + 16-byte JFIF
    * APP0 + variable-length COM + SOF0 (precision/height/width). WAV:
    * 44-byte RIFF/fmt/data header, fields little-endian, 16-bit samples
    * at 44.1 kHz. 0xFF bytes cannot occur in UTF-8 body text, so the
    * first FFC0 in a payload IS the SOF0 marker.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    val w = (col("n_chars") % 640 + 32).cast("int")
    val h = (col("n_chars") % 480 + 32).cast("int")
    // string→binary CAST (= UTF-8 bytes), deliberately not encode():
    // encode plans as a StaticInvoke holding a Class object, whose
    // identity hashCode makes Catalyst's commutative-operand reorder
    // (`36 + length(body)` vs `length(body) + 36`) flip per JVM — the
    // one plan-fingerprint instability two same-code bench runs showed
    val body = col("text").cast("binary")
    val png = concat(
      bin(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, // signature
        0, 0, 0, 13, 'I', 'H', 'D', 'R'),              // IHDR len + type
      be(w, 4), be(h, 4),
      bin(8, 6, 0, 0, 0,      // depth 8, color 6 (RGBA), comp/filter/interlace
        0, 0, 0, 0),          // CRC (unchecked by a header reader)
      body)
    val jpeg = concat(
      bin(0xFF, 0xD8,                                  // SOI
        0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, // APP0, len 16
        0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00),
      bin(0xFF, 0xFE), be(jpegPad + 2, 2),             // COM, len incl self
      repeat(lit("x"), jpegPad).cast("binary"),
      bin(0xFF, 0xC0, 0x00, 0x11, 0x08),               // SOF0, len 17, prec 8
      be(h, 2), be(w, 2),
      bin(0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01),
      body)
    val wav = concat(
      lit("RIFF").cast("binary"), le(length(body) + 36, 4),
      lit("WAVEfmt ").cast("binary"), le(lit(16), 4),
      le(lit(1), 2), le(lit(2), 2),                    // PCM, stereo
      le(lit(44100), 4), le(lit(44100 * 4), 4),        // rate, byte rate
      le(lit(4), 2), le(lit(16), 2),                   // block align, depth
      lit("data").cast("binary"), le(length(body), 4),
      body)
    val fmt = element_at(array(lit("jpeg"), lit("png"), lit("wav")),
      (col("doc_id") % 3 + 1).cast("int"))
    Tables.documents(s, d).select(
      col("doc_id"),
      when(fmt === "png", png).when(fmt === "jpeg", jpeg)
        .otherwise(wav).as("payload"),
      struct(fmt.as("media_format"),
        w.as("width"), h.as("height")).as("meta"))
  }

  /** Declarative header decode over the binary column — substr + hex +
    * conv, fully codegen'd, no UDF and no row-by-row decode pass:
    * PNG dims at the IHDR's fixed offsets; JPEG dims behind an actual
    * SOF0 SCAN (first FFC0 — the marker walk every JPEG reader does,
    * since APP/COM segments before the SOF have variable length); WAV
    * bit depth from the little-endian fmt chunk. Unknown formats decode
    * to null, never an error.
    */
  def parsedWidth(payload: Column, fmt: Column): Column = {
    val sof = sofPos(payload)
    when(fmt === "png", beInt(payload, lit(17), 4))
      .when(fmt === "jpeg", beInt(payload, sof + 7, 2))
  }

  def parsedHeight(payload: Column, fmt: Column): Column = {
    val sof = sofPos(payload)
    when(fmt === "png", beInt(payload, lit(21), 4))
      .when(fmt === "jpeg", beInt(payload, sof + 5, 2))
  }

  def parsedDepth(payload: Column, fmt: Column): Column =
    when(fmt === "png", beInt(payload, lit(25), 1))
      .when(fmt === "jpeg", beInt(payload, sofPos(payload) + 4, 1))
      .when(fmt === "wav", // LE 16-bit field at offset 35
        conv(concat(hex(payload.substr(lit(36), lit(1))),
          hex(payload.substr(lit(35), lit(1)))), 16, 10).cast("long"))

  /** 1-based offset of the first SOF0 marker (FFC0): headers sit in the
    * first ~200 bytes by construction, and 0xFF can't appear in UTF-8
    * body bytes, so the scan is bounded and unambiguous.
    */
  private def sofPos(payload: Column): Column =
    element_at(filter(sequence(lit(3), lit(200)),
      i => hex(payload.substr(i.cast("int"), lit(2))) === "FFC0"), 1)

  private def beInt(payload: Column, pos: Column, n: Int): Column =
    conv(hex(payload.substr(pos.cast("int"), lit(n))), 16, 10).cast("long")

  /** Batched decode: one partition pass, rows streamed through the decoder
    * iterator-to-iterator (no per-partition materialization).
    */
  def decodePipeline(s: SparkSession, d: String): DataFrame = {
    val media = mediaTable(s, d)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val meta = r.getStruct(2)
        val (fmt, w, h) = (meta.getString(0), meta.getInt(1), meta.getInt(2))
        Row(docId, fmt, payload.length, w, h,
          fakeDecode(payload, w, h).toSeq)
      }
    }(enc)
  }

  val FrameBytes = 64
  val FrameStride = 4

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("frame_bytes", IntegerType),
    StructField("f0", FloatType)))

  /** Strided frame sampling: each payload is treated as a stream of fixed-
    * size frames; every FrameStride-th frame is sliced DECLARATIVELY
    * (sequence + binary substr — map-only, codegen'd, no decode cost for
    * skipped frames) and only the sampled frames pay the per-frame decode
    * in the partition pass. This is the video-keyframe shape: slice cheap,
    * decode expensive, so sample before decoding.
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val frames = mediaTable(s, d)
      .select(col("doc_id"), col("payload"), col("meta"),
        explode(sequence(lit(0L),
          expr(s"(length(payload) - 1) div $FrameBytes"),
          lit(FrameStride.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"), col("meta"),
        expr(s"substr(payload, cast(frame_idx * $FrameBytes + 1 as int), $FrameBytes)")
          .as("frame"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameSchema)
    frames.mapPartitions { rows =>
      rows.map { r =>
        val frame = r.getAs[Array[Byte]](3)
        val meta = r.getStruct(2)
        val feats = fakeDecode(frame, meta.getInt(1), meta.getInt(2))
        Row(r.getLong(0), r.getLong(1), frame.length, feats(0))
      }
    }(enc)
  }

  val defs: Map[String, Q] = Map(
    // Sampled-frame features, one row per (doc, kept frame). Rows-only:
    // the stub decoder has no SQL analogue; PipelineSpec locks the frame
    // arithmetic and determinism.
    "mm_frame_sample" -> Q(
      (s, d) => frameSample(s, d).orderBy("doc_id", "frame_idx"),
      None),

    // Media-lake accounting over the binary column: per-format volumes,
    // payload byte totals (length() on binary — bytes never leave the
    // executors), dimensions DECODED FROM THE ACTUAL CONTAINER HEADERS
    // (PNG IHDR offsets, a JPEG SOF0 marker scan, the WAV fmt chunk —
    // substr+conv, no UDF), and how many frames the strided sampler would
    // decode — the planning query a media pipeline runs BEFORE paying for
    // decode. The DuckDB oracle computes the same stats from the
    // synthesis ground truth, so the hash match PROVES the byte-level
    // parse (n_dim_mismatch additionally cross-checks parsed dims against
    // the metadata column row by row — the oracle expects exactly 0).
    "mm_media_stats" -> Q(
      (s, d) => {
        val fmt = col("meta.media_format")
        mediaTable(s, d)
          .select(fmt.as("media_format"),
            length(col("payload")).cast("long").as("n_bytes"),
            parsedWidth(col("payload"), fmt).as("parsed_width"),
            parsedHeight(col("payload"), fmt).as("parsed_height"),
            parsedDepth(col("payload"), fmt).as("bit_depth"),
            col("meta.width").cast("long").as("width"),
            col("meta.height").cast("long").as("height"))
          // greatest(n_bytes, 1): an empty payload still yields one
          // zero-length frame in frameSample (sequence(0, 0, stride)),
          // and without the clamp Spark's div (truncate toward zero) and
          // DuckDB's // (floor) disagree on (0-1)/64 — a latent oracle
          // mismatch on any corpus with an empty document
          .withColumn("n_frames_sampled",
            expr(s"((greatest(n_bytes, 1) - 1) div $FrameBytes)" +
              s" div $FrameStride + 1"))
          .groupBy("media_format")
          .agg(count(lit(1)).as("n_media"),
            sum("n_bytes").cast("long").as("total_bytes"),
            round(avg("n_bytes"), 6).as("avg_bytes"),
            round(avg("parsed_width"), 6).as("avg_width"),
            round(avg("parsed_height"), 6).as("avg_height"),
            round(avg("bit_depth"), 6).as("avg_bit_depth"),
            sum(when(col("media_format") =!= "wav" &&
              (col("parsed_width") =!= col("width") ||
                col("parsed_height") =!= col("height")), 1L)
              .otherwise(0L)).as("n_dim_mismatch"),
            sum("n_frames_sampled").cast("long").as("n_frames_sampled"))
          .orderBy("media_format")
      },
      // ground truth: header sizes from the container specs — PNG 33
      // (8 sig + 25 IHDR incl CRC), JPEG 43 + per-doc COM padding,
      // WAV 44; dims/depth from the synthesis formulas
      s"""WITH m AS (
         |  SELECT doc_id,
         |    list_extract(['jpeg', 'png', 'wav'],
         |      cast(doc_id % 3 + 1 as int)) AS media_format,
         |    cast(octet_length(encode(text))
         |      + CASE cast(doc_id % 3 + 1 as int)
         |          WHEN 1 THEN 43 + doc_id % 7
         |          WHEN 2 THEN 33 ELSE 44 END as bigint) AS n_bytes,
         |    cast(n_chars % 640 + 32 as bigint) AS width,
         |    cast(n_chars % 480 + 32 as bigint) AS height,
         |    CASE WHEN doc_id % 3 = 2 THEN 16 ELSE 8 END AS bit_depth
         |  FROM documents)
         |SELECT media_format, count(*) AS n_media,
         |  cast(sum(n_bytes) as bigint) AS total_bytes,
         |  round(avg(n_bytes), 6) AS avg_bytes,
         |  round(avg(CASE WHEN media_format <> 'wav' THEN width END), 6)
         |    AS avg_width,
         |  round(avg(CASE WHEN media_format <> 'wav' THEN height END), 6)
         |    AS avg_height,
         |  round(avg(bit_depth), 6) AS avg_bit_depth,
         |  cast(sum(0) as bigint) AS n_dim_mismatch,
         |  cast(sum((greatest(n_bytes, 1) - 1) // $FrameBytes // $FrameStride + 1)
         |    as bigint) AS n_frames_sampled
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin),

    // Flattened to scalar columns for the driver's parquet dump.
    "mm_decode_pipeline" -> Q(
      (s, d) => decodePipeline(s, d)
        .select(col("doc_id"), col("media_format"), col("n_bytes"),
          col("width"), col("height"),
          element_at(col("features"), 1).as("f0"),
          element_at(col("features"), 2).as("f1"),
          aggregate(col("features"), lit(0.0),
            (acc, v) => acc + v.cast("double")).as("feature_sum"))
        .orderBy("doc_id"),
      None)
  )
}
