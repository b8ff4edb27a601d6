package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct. The feature extractor routes by MODALITY
  * then by MAGIC: image-kind binary PPM (P6) payloads go through a
  * REAL validating decoder and real pixel math; payloads with no
  * recognized magic ride a clearly-marked deterministic stub
  * ([[byteStats]] over the encoded stream) so this table's
  * raw-text-payload rows stay oracle-checkable. The REAL codec stack
  * for the public formats lives in [[Codecs]] — PNG/JPEG via the JDK's
  * own ImageIO, WAV and Y4M via hand-written validating parsers — with
  * its own oracle-checked queries (q160-q163, [[CodecQueries]]).
  * Everything Spark-side is real on both legs: schema, batched
  * per-partition execution (the Scala analogue of mapInPandas), feature
  * schema, and partition sizing.
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

  /** Byte-histogram statistics (shannon entropy in bits, mean byte).
    * Over DECODED PIXELS this is a real image statistic; over an
    * encoded payload it is the STUB leg — a deterministic stand-in
    * (??? in spirit) for payloads with no recognized codec magic,
    * reproducible so the oracle can mirror it. Payloads in a real
    * public format go through the real decoders ([[decodePpm]] here,
    * PNG/JPEG/WAV/Y4M in [[Codecs]]).
    */
  private def byteStats(bytes: Array[Byte]): (Double, Double) = {
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

  // ---------------------------------------------------------------
  // REAL codec path: PPM (P6) — a header plus raw interleaved RGB,
  // parsed by a hand-written validating decoder with real pixel
  // resampling and an end-to-end DuckDB oracle (the synthesized
  // payload bytes are reconstructible in SQL, so the oracle computes
  // the expected thumbnail independently and any decode/resize bug
  // hash-mismatches). The other real codecs — PNG/JPEG via the JDK's
  // ImageIO, WAV, Y4M — live in Codecs with the same oracle
  // discipline (q160-q163).
  // ---------------------------------------------------------------

  /** A decoded P6 image: row-major interleaved RGB, maxval 255. */
  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte])

  final case class PpmMedia(media_id: Long, ppm: Array[Byte])
  final case class PpmThumbStats(media_id: Long, width: Int, height: Int,
      r_mean: Double, g_mean: Double, b_mean: Double)

  /** q159's thumbnail geometry. */
  val ThumbW = 4
  val ThumbH = 3

  /** Encode a binary PPM: `P6\n<w> <h>\n255\n` + w*h*3 RGB bytes. */
  def ppmEncode(img: PpmImage): Array[Byte] = {
    require(img.pixels.length == img.width * img.height * 3,
      s"PPM encode: ${img.pixels.length} payload bytes for " +
        s"${img.width}x${img.height}")
    s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ img.pixels
  }

  /** Decode + VALIDATE a binary PPM (P6, maxval 255; `#` header
    * comments per the spec). Malformed input throws — a real ingest
    * wants the loud failure, not a silent garbage image.
    */
  def decodePpm(bytes: Array[Byte]): PpmImage = {
    var i = 0
    def isWs(b: Byte) =
      b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f'
    def skipWs(): Unit = {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i < bytes.length && bytes(i) == '#') {
        while (i < bytes.length && bytes(i) != '\n') i += 1
        skipWs()
      }
    }
    def int(what: String): Int = {
      skipWs()
      val s = i
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
      require(i > s, s"PPM: expected $what at byte $s")
      new String(bytes, s, i - s,
        java.nio.charset.StandardCharsets.US_ASCII).toInt
    }
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "PPM: not a P6 stream")
    i = 2
    val w = int("width"); val h = int("height")
    val maxval = int("maxval")
    require(w > 0 && h > 0, s"PPM: bad dimensions ${w}x$h")
    require(maxval == 255, s"PPM: unsupported maxval $maxval")
    require(i < bytes.length && isWs(bytes(i)),
      "PPM: missing single-whitespace header terminator")
    i += 1
    // Long arithmetic: crafted header dims must not wrap Int and slip a
    // mismatched payload past the check (the parser IS the validation)
    val need = w.toLong * h * 3
    require(need <= Int.MaxValue, s"PPM: dimensions ${w}x$h overflow")
    require((bytes.length - i).toLong == need,
      s"PPM: payload ${bytes.length - i} bytes, need $need")
    PpmImage(w, h, java.util.Arrays.copyOfRange(bytes, i, bytes.length))
  }

  /** REAL nearest-neighbor resample: target pixel (tx, ty) reads source
    * (tx*w/tw, ty*h/th) — integer floor, the canonical NN mapping.
    */
  def resizeNearest(img: PpmImage, tw: Int, th: Int): PpmImage = {
    val out = new Array[Byte](tw * th * 3)
    var ty = 0
    while (ty < th) {
      val sy = ty * img.height / th
      var tx = 0
      while (tx < tw) {
        val sx = tx * img.width / tw
        val s = (sy * img.width + sx) * 3
        val t = (ty * tw + tx) * 3
        out(t) = img.pixels(s)
        out(t + 1) = img.pixels(s + 1)
        out(t + 2) = img.pixels(s + 2)
        tx += 1
      }
      ty += 1
    }
    PpmImage(tw, th, out)
  }

  /** VALID P6 payloads synthesized deterministically from the
    * image-kind docs: w = 8 + id % 9, h = 6 + id % 7, pixel byte j =
    * text byte (j mod len) — so the oracle can reconstruct every pixel
    * from SQL and check the real decode + resample end to end. ASCII
    * docs only, ENFORCED on both engines (bytes == chars): on
    * non-ASCII text the byte-mod cycling and SQL's codepoint ord()
    * would silently diverge — the guard makes the contract explicit
    * instead of latent (the synthetic corpus is all-ASCII today).
    */
  def ppmMediaFromDocuments(spark: SparkSession,
      dir: String): Dataset[PpmMedia] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 0 && length(col("text")) > 0
        && octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        PpmMedia(id, ppmEncode(synthPpm(id,
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      }
  }

  /** The ONE copy of the synthesized-PPM geometry (shared by q159's
    * media and [[mediaWithPpm]]): w = 8 + id % 9, h = 6 + id % 7,
    * pixel byte j = text byte (j mod len).
    */
  private def synthPpm(id: Long, t: Array[Byte]): PpmImage = {
    val w = (8 + id % 9).toInt
    val h = (6 + id % 7).toInt
    PpmImage(w, h, Array.tabulate(w * h * 3)(j => t(j % t.length)))
  }

  /** q159's body: the REAL decode -> resize -> stats pipeline, batched
    * per partition like [[extractFeatures]] — each image is parsed by
    * the validating PPM decoder and resampled with real pixel math;
    * the output is per-channel thumbnail means.
    */
  def ppmThumbStats(spark: SparkSession,
      dir: String): Dataset[PpmThumbStats] = {
    import spark.implicits._
    ppmMediaFromDocuments(spark, dir).mapPartitions { rows =>
      rows.map { m =>
        val img = decodePpm(m.ppm)
        val thumb = resizeNearest(img, ThumbW, ThumbH)
        var r = 0L; var g = 0L; var b = 0L
        var i = 0
        while (i < thumb.pixels.length) {
          r += thumb.pixels(i) & 0xff
          g += thumb.pixels(i + 1) & 0xff
          b += thumb.pixels(i + 2) & 0xff
          i += 3
        }
        val n = (ThumbW * ThumbH).toDouble
        PpmThumbStats(m.media_id, img.width, img.height,
          r / n, g / n, b / n)
      }
    }
  }

  /** Per-partition batched feature extraction — the Scala analogue of
    * mapInPandas: one pass per partition, no per-row task overhead, stays
    * distributed. Frame sampling takes every k-th frame up to 8; resize
    * targets a 64x64 thumbnail.
    *
    * DISPATCH: the `kind` column routes the DECODER FAMILY (how a real
    * pipeline dispatches — the modality column picks image vs audio
    * handling) and the payload's magic selects the codec within it: an
    * image-kind payload opening with the P6 magic goes through the
    * REAL validating PPM decoder — entropy / mean over the DECODED
    * PIXELS, thumbnail geometry from the DECODED dimensions (the
    * header is ground truth; width/height metadata only hints) — and a
    * malformed P6 stream fails loudly mid-scan, the behavior a real
    * ingest wants. Everything else (other kinds, image payloads
    * without the magic) rides the stub byte-stats leg — this table's
    * payloads are raw text bytes, not encoded streams. The kind guard
    * keeps the
    * dispatch total across modalities: an audio/video payload whose
    * first bytes happen to spell "P6" must not be forced through an
    * image parser (it would throw on the first real stream). Within
    * the image kind the magic is trusted: an image payload that
    * DECLARES P6 but fails to parse throws — by design (a corrupt
    * image should fail loudly, not emit stub features). This table's
    * non-PPM payloads are raw text bytes with no codec magic, so they
    * ride the stub; payloads in the real public formats go through
    * [[CodecQueries.mediaSummary]]'s five-codec dispatch (q163), the
    * production router. One latent
    * caveat for the q41 oracle (which routes on kind + ascii, the
    * condition [[mediaWithPpm]] encodes): an image row whose RAW text
    * starts with "P6" yet is non-ASCII would throw here while the
    * oracle computes a stub row — a crash, never a silent wrong
    * answer, and unreachable on the all-ASCII corpus.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val isPpm = r.kind == "image" && r.bytes.length >= 2 &&
          r.bytes(0) == 'P'.toByte && r.bytes(1) == '6'.toByte
        // within the image kind, every REAL codec magic routes to its
        // real decoder; q41's table only ever carries P6 or raw text,
        // so its oracle is untouched — the PNG/JPEG legs are pinned by
        // MultimodalSpec against direct decodes
        val isPng = r.kind == "image" && Codecs.isPng(r.bytes)
        val isJpeg = r.kind == "image" && Codecs.isJpeg(r.bytes)
        val (entropy, meanByte, w, h) =
          if (isPpm || isPng || isJpeg) {
            val img =
              if (isPpm) decodePpm(r.bytes)
              else if (isPng) Codecs.decodePng(r.bytes)
              else Codecs.decodeJpeg(r.bytes)
            val (e, m) = byteStats(img.pixels)
            (e, m, img.width, img.height)
          } else {
            val (e, m) = byteStats(r.bytes)
            (e, m, r.width, r.height)
          }
        val frames = math.min(8, math.max(1, r.n_frames / 8))
        val scale = 64.0 / math.max(w, h)
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, entropy,
          meanByte, if (r.kind == "video") frames else 1,
          math.max(1, math.round(w * scale).toInt),
          math.max(1, math.round(h * scale).toInt))
      }
    }
  }

  /** q41's input: [[mediaFromDocuments]] with every image-kind row
    * whose text is non-empty ASCII re-encoded as a REAL binary PPM
    * (the q159 synthesis — pixel j = text byte j mod len — so the
    * oracle reconstructs every pixel in SQL) and its width/height
    * metadata aligned to the encoded dimensions. Rows the synthesis
    * can't cover (empty / non-ASCII text, mirroring
    * [[ppmMediaFromDocuments]]'s guard) keep the raw payload and ride
    * the stub leg — so the extractor's kind+magic dispatch is
    * exercised on both paths in one table.
    */
  def mediaWithPpm(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    mediaFromDocuments(spark, dir).map { r =>
      val ascii = r.bytes.nonEmpty && r.bytes.forall(b => (b & 0xff) < 128)
      if (r.kind == "image" && ascii) {
        val img = synthPpm(r.media_id, r.bytes)
        r.copy(bytes = ppmEncode(img),
          width = img.width, height = img.height)
      } else r
    }
  }
}
