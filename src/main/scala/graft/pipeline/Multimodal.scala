package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to typed metadata, and per-batch
  * decode / feature-extract / resize / frame-sample stages run as
  * partition-local batch functions (`mapPartitions` over `Row`
  * iterators — the Scala analogue of `mapInPandas`: one arrow-batch
  * shaped function per partition, never per row).
  *
  * The actual media codecs are NOT available in this build environment,
  * so the decode kernel is STUBBED with a deterministic fake
  * ([[stubDecode]]) — the Spark-side contract (schema, batch shape,
  * partitioning, null handling) is real and tested; swapping in a real
  * decoder is a one-function change.
  *
  * Scale design: payload bytes never shuffle — all media stages are
  * narrow partition-local maps; only extracted (small, typed) features
  * flow into joins/aggregations downstream. Control
  * `spark.sql.files.maxPartitionBytes` so one partition of payloads
  * fits executor memory.
  */
object Multimodal {

  /** Schema of a media channel: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)
  ))

  /** Feature schema produced by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = true)
  ))

  /** STUB decode kernel — deterministic fake standing in for a real
    * codec (`???` boundary): derives an 8-dim "feature" from byte
    * statistics of the payload. Real implementation would decode the
    * image/audio and pool activations; everything around it (batching,
    * schema, null pass-through) is the production shape.
    */
  def stubDecode(kind: String, payload: Array[Byte]): Array[Double] = {
    // ??? real codec goes here; deterministic fake below — a codepoint
    // histogram (not raw bytes) so the cross-engine oracle holds for
    // multi-byte UTF-8 payloads too
    if (payload == null) null
    else {
      val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      val bins = new Array[Double](8)
      var n = 0
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        bins(cp & 7) += 1.0
        n += 1
        i += Character.charCount(cp)
      }
      bins.map(_ / math.max(n, 1).toDouble)
    }
  }

  /** Partition-local decode/feature-extract stage. Batch-shaped: the
    * iterator is consumed lazily per partition (constant memory), rows
    * with null payloads produce null features (not dropped — the
    * metadata row survives for audit).
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "kind", "payload").mapPartitions { it: Iterator[Row] =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val nBytes = if (payload == null) 0 else payload.length
        Row(r.getLong(0), r.getString(1), nBytes,
          stubDecode(r.getString(1), payload))
      }
    }(enc)
  }

  /** Frame sampling for video-kind rows: keep every `stride`-th frame
    * index as its own row (frame payload extraction is part of the
    * stubbed codec). Produces the (media_id, frame_idx) exploded shape
    * a caption/embedding stage consumes.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video" && col("n_frames").isNotNull &&
        col("n_frames") > 0) // sequence(0, -1, +step) would throw
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize stage contract: records target dims next to the payload;
    * the pixel transform itself lives in the stubbed codec. Keeps the
    * plan a narrow projection.
    */
  def resizePlan(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("target_width", lit(w)).withColumn("target_height", lit(h))

  /** Build a synthetic media frame from the documents table — gives the
    * plumbing a deterministic, driver-data-derived input (payload =
    * UTF-8 of the text standing in for encoded bytes).
    */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio")).otherwise(lit("video")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, lit(64)).otherwise(lit(null)).cast("int").as("width"),
      when(col("doc_id") % 3 === 0, lit(64)).otherwise(lit(null)).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, lit(16000)).otherwise(lit(null)).cast("int").as("sample_rate"),
      when(col("doc_id") % 3 === 2, (col("n_chars") % 32 + 1)).otherwise(lit(null))
        .cast("int").as("n_frames"))
}
