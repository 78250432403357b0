package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with typed metadata alongside; decode /
  * feature-extraction runs batch-wise over partitions.
  *
  * The decode step itself is a STUB — this container ships no image/audio
  * codecs — implemented as a deterministic fake (md5-derived bytes) so the
  * Spark-side plumbing (schema, batch shape, partitioning, null handling)
  * is real and tested. Swap [[MediaDecoder.decode]] for a JNI/FFI codec
  * call in production; nothing else changes.
  *
  * Scale posture: binary payloads never shuffle here — metadata extraction
  * and feature extraction are map-only projections; downstream analytics
  * (dedup by content hash, ANN over features) operate on the small
  * sketches, exactly like [[Dedup]]/[[Similarity]] over text/embeddings.
  */
object Multimodal {

  /** Canonical multimodal schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Wrap the `documents` fixture as a media table: the UTF-8 bytes of
    * `text` play the opaque payload (derived from driver fixtures, not
    * synthesized data; real deployments read binary parquet/blob columns
    * the same way).
    */
  def documentsAsMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("media_type"))

  /** Map-only metadata over the payload: byte length, content digest, and
    * a head-bytes hex sample (magic-number sniffing at scale).
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      octet_length(col("media")).as("media_len"),
      md5(col("media")).as("media_md5"),
      upper(hex(expr("substring(media, 1, 8)"))).as("head_hex"),
      col("media_type"))

  /** Deterministic fake "feature extraction" as a pure projection: 4
    * pseudo-features derived from the content digest's hex digits,
    * normalized to [0, 1]. A real extractor returns `array<float>` from a
    * model; the pipeline shape (map-only, per-row, no shuffle) is the same.
    */
  def fakeFeatures(media: DataFrame): DataFrame = {
    def f(i: Int) = round(
      conv(substring(md5(col("media")), i, 1), 16, 10).cast("double") / 15.0,
      6).as(s"f$i")
    media.select(col("media_id"), f(1), f(2), f(3), f(4))
  }

  /** The batch decode path: partition-wise iteration with an explicit
    * output schema — the Scala analogue of `mapInPandas` (same batch
    * shape: many rows in, many rows out, schema declared up front).
    * Runs [[MediaDecoder.decode]] per row; a real codec would amortize
    * model/codec init per partition exactly here.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      val decoder = MediaDecoder.open() // per-partition init, not per-row
      rows.map { r =>
        val (frames, feat) = decoder.decode(r.getAs[Array[Byte]]("media"))
        Row(r.getLong(0), frames, feat)
      }
    }(enc)
  }
}

/** Deterministic stand-in for a media codec; see [[Multimodal]] scaladoc. */
object MediaDecoder {
  def open(): MediaDecoder = new MediaDecoder
}

final class MediaDecoder {
  /** STUB decode: a real implementation would parse the container, sample
    * frames, and run a feature model. The fake derives both outputs from
    * the payload bytes deterministically so tests are exact.
    */
  def decode(media: Array[Byte]): (Int, Seq[Float]) = {
    if (media == null || media.isEmpty) return (0, Seq(0f, 0f, 0f, 0f))
    val d = java.security.MessageDigest.getInstance("MD5").digest(media)
    val frames = math.max(1, media.length / 64)
    (frames, d.take(4).toSeq.map(b => (b & 0xff) / 255.0f))
  }
}
