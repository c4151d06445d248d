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

  val defs: Map[String, Q] = Map(
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
