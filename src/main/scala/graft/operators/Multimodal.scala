package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.D): media as an opaque `binary`
  * column + typed metadata, decoded/featurized in batched partition passes.
  *
  * The container has no image/audio codecs, so `fakeDecode` stands in for
  * the real decoder (clearly marked); everything AROUND it — the binary
  * column synthesis, metadata schema, per-partition batching, output
  * schema — is real Spark plumbing and is what matters at 100 TB: media
  * bytes never hit the driver, decode is a narrow map over partitions
  * (mapPartitions is the Scala analogue of mapInPandas batches), and
  * feature vectors come out as columnar float arrays.
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

  /** Synthetic media table: document bytes as the opaque payload plus a
    * typed metadata struct — the schema a real image/audio parquet lake has.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(array(lit("jpeg"), lit("png"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_format"),
        (col("n_chars") % 640 + 32).cast("int").as("width"),
        (col("n_chars") % 480 + 32).cast("int").as("height")).as("meta"))

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
    // executors), metadata dimension means, and how many frames the strided
    // sampler would decode — the planning query a video/image pipeline runs
    // BEFORE paying for decode. Fully declarative → DuckDB-oracled
    // (octet_length over the same UTF-8 bytes, same frame arithmetic).
    "mm_media_stats" -> Q(
      (s, d) => {
        mediaTable(s, d)
          .select(col("meta.media_format").as("media_format"),
            length(col("payload")).cast("long").as("n_bytes"),
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
            round(avg("width"), 6).as("avg_width"),
            round(avg("height"), 6).as("avg_height"),
            sum("n_frames_sampled").cast("long").as("n_frames_sampled"))
          .orderBy("media_format")
      },
      s"""WITH m AS (
         |  SELECT doc_id,
         |    list_extract(['jpeg', 'png', 'wav'],
         |      cast(doc_id % 3 + 1 as int)) AS media_format,
         |    cast(octet_length(encode(text)) as bigint) AS n_bytes,
         |    cast(n_chars % 640 + 32 as bigint) AS width,
         |    cast(n_chars % 480 + 32 as bigint) AS height
         |  FROM documents)
         |SELECT media_format, count(*) AS n_media,
         |  cast(sum(n_bytes) as bigint) AS total_bytes,
         |  round(avg(n_bytes), 6) AS avg_bytes,
         |  round(avg(width), 6) AS avg_width,
         |  round(avg(height), 6) AS avg_height,
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
