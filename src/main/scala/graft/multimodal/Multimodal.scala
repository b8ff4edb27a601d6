package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct. The actual image/audio codecs are NOT in this
  * environment, so the decode kernel is a clearly-marked deterministic
  * fake — but everything Spark-side is real: schema, batched
  * per-partition execution (the Scala analogue of mapInPandas), feature
  * schema, and partition sizing. Swapping `fakeDecode` for a real codec
  * is a one-function change.
  */
object Multimodal {
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, n_frames: Int)
  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Long, entropy: Double, mean_byte: Double,
      frames_sampled: Int, thumb_w: Int, thumb_h: Int)

  /** Build a media table from `documents` (the driver's data): text bytes
    * stand in for an encoded payload; metadata derives deterministically.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        (col("doc_id") % 120 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** STUB — deterministic fake decode: a real build would call an image
    * codec here (??? in spirit). Returns pseudo-pixel statistics derived
    * only from the bytes, so tests are reproducible.
    */
  private def fakeDecode(bytes: Array[Byte]): (Double, Double) = {
    var h = 1125899906842597L
    var sum = 0L
    val counts = new Array[Long](256)
    bytes.foreach { b =>
      h = 31 * h + b
      sum += (b & 0xff)
      counts(b & 0xff) += 1
    }
    val n = math.max(bytes.length, 1)
    val entropy = counts.filter(_ > 0).map { c =>
      val p = c.toDouble / n; -p * math.log(p) / math.log(2)
    }.sum
    (entropy, sum.toDouble / n)
  }

  /** Per-partition batched feature extraction — the Scala analogue of
    * mapInPandas: one pass per partition, no per-row task overhead, stays
    * distributed. Frame sampling takes every k-th frame up to 8; resize
    * targets a 64x64 thumbnail (metadata only under the stub codec).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (entropy, meanByte) = fakeDecode(r.bytes)
        val frames = math.min(8, math.max(1, r.n_frames / 8))
        val scale = 64.0 / math.max(r.width, r.height)
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, entropy,
          meanByte, if (r.kind == "video") frames else 1,
          math.max(1, math.round(r.width * scale).toInt),
          math.max(1, math.round(r.height * scale).toInt))
      }
    }
  }
}
