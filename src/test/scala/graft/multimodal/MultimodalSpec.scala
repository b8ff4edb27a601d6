package graft.multimodal

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("media table: binary payload round-trips, metadata deterministic") {
    val m = Multimodal.mediaFromDocuments(spark, sf).collect()
    assert(m.length == 500)
    m.foreach { r =>
      assert(r.bytes.nonEmpty)
      assert(Set("image", "audio", "video")(r.kind))
      assert(r.kind == Seq("image", "audio", "video")((r.media_id % 3).toInt))
    }
  }

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, sf)).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, sf)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "features not deterministic")
    f1.foreach { r =>
      assert(r.entropy > 0 && r.entropy <= 8.0) // byte entropy bound
      assert(r.mean_byte > 0 && r.mean_byte < 256)
      assert(r.thumb_w <= 64 && r.thumb_h <= 64)
      if (r.kind != "video") assert(r.frames_sampled == 1)
    }
  }

  test("PPM codec: encode/decode round-trips exactly, incl. header comments") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 25) {
      val w = 1 + rnd.nextInt(12); val h = 1 + rnd.nextInt(9)
      val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val img = Multimodal.PpmImage(w, h, px)
      val back = Multimodal.decodePpm(Multimodal.ppmEncode(img))
      assert(back.width == w && back.height == h)
      assert(java.util.Arrays.equals(back.pixels, px))
    }
    // the spec's `#` comment form decodes too
    val withComment = ("P6\n# a comment\n2 1\n255\n"
      .getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4, 5, 6))
    val c = Multimodal.decodePpm(withComment)
    assert(c.width == 2 && c.height == 1 && c.pixels.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("PPM codec: malformed streams are rejected loudly") {
    val good = Multimodal.ppmEncode(
      Multimodal.PpmImage(2, 2, Array.fill(12)(7.toByte)))
    intercept[IllegalArgumentException](
      Multimodal.decodePpm("P5\n2 2\n255\n".getBytes("US-ASCII"))) // wrong magic
    intercept[IllegalArgumentException](
      Multimodal.decodePpm(good.dropRight(1))) // truncated payload
    intercept[IllegalArgumentException](
      Multimodal.decodePpm(good ++ Array[Byte](0))) // trailing junk
    intercept[IllegalArgumentException](Multimodal.decodePpm(
      "P6\n2 2\n65535\n".getBytes("US-ASCII")
        ++ Array.fill(24)(0.toByte))) // 16-bit maxval unsupported
    // crafted dims whose w*h*3 wraps Int must fail LOUDLY, not slip a
    // mismatched payload past the length check
    intercept[IllegalArgumentException](Multimodal.decodePpm(
      "P6\n43691 32768\n255\n".getBytes("US-ASCII")
        ++ Array.fill(12)(0.toByte)))
  }

  test("nearest-neighbor resample: hand-computed mappings") {
    // 2x2 with distinct corner colors: 1x1 takes the top-left texel
    val corners = Array[Byte](
      10, 11, 12, /**/ 20, 21, 22,
      30, 31, 32, /**/ 40, 41, 42)
    val img = Multimodal.PpmImage(2, 2, corners)
    assert(Multimodal.resizeNearest(img, 1, 1).pixels.toSeq
      == Seq[Byte](10, 11, 12))
    // 2x upscale: each source texel replicates into a 2x2 block
    val up = Multimodal.resizeNearest(img, 4, 4)
    val texel = (x: Int, y: Int) =>
      up.pixels.slice((y * 4 + x) * 3, (y * 4 + x) * 3 + 3).toSeq
    assert(texel(0, 0) == Seq[Byte](10, 11, 12)
      && texel(1, 1) == Seq[Byte](10, 11, 12))
    assert(texel(2, 0) == Seq[Byte](20, 21, 22))
    assert(texel(0, 2) == Seq[Byte](30, 31, 32))
    assert(texel(3, 3) == Seq[Byte](40, 41, 42))
    // 3x1 -> 2x1 keeps texels 0 and 1 (floor mapping: 0*3/2=0, 1*3/2=1)
    val row = Multimodal.PpmImage(3, 1,
      Array[Byte](1, 1, 1, 2, 2, 2, 3, 3, 3))
    assert(Multimodal.resizeNearest(row, 2, 1).pixels.toSeq
      == Seq[Byte](1, 1, 1, 2, 2, 2))
  }

  test("q159 pipeline: every image-kind doc yields one decoded thumbnail " +
      "row with in-range channel means; synthesis is a valid P6 corpus") {
    val media = Multimodal.ppmMediaFromDocuments(spark, sf).collect()
    assert(media.nonEmpty)
    media.foreach { m =>
      val img = Multimodal.decodePpm(m.ppm) // validating parse
      assert(img.width == (8 + m.media_id % 9).toInt
        && img.height == (6 + m.media_id % 7).toInt)
    }
    val stats = Multimodal.ppmThumbStats(spark, sf).collect()
    assert(stats.length == media.length)
    stats.foreach { s =>
      // the payload cycles ASCII text bytes: printable range
      assert(s.r_mean >= 32 && s.r_mean < 127, s"doc ${s.media_id}")
      assert(s.g_mean >= 32 && s.g_mean < 127)
      assert(s.b_mean >= 32 && s.b_mean < 127)
    }
  }

  test("extractFeatures routes image-kind P6 payloads through the " +
      "real decoder (pixel stats, DECODED dims — width/height " +
      "metadata only a hint); other kinds and non-P6 images ride the " +
      "stub; malformed image P6 fails loudly") {
    import spark.implicits._
    // constant-color 4x2 image: pixel entropy is EXACTLY 0 — while the
    // stub leg over the same ENCODED stream would see the header bytes
    // too and report entropy > 0, so the zero proves the decode ran
    val flat = Multimodal.PpmImage(4, 2, Array.fill(4 * 2 * 3)(65.toByte))
    val ppmBytes = Multimodal.ppmEncode(flat)
    val rows = Seq(
      // metadata width/height deliberately LIE (999x999): thumb must
      // come from the decoded 4x2
      Multimodal.MediaRow(1L, "image", ppmBytes, 999, 999, 1),
      // an AUDIO payload that happens to open with the P6 bytes: the
      // kind guard must keep it on the stub leg — forcing it through
      // an image parser would throw on the first real audio stream
      // whose bytes start that way (and diverge from the oracle's
      // kind-based dispatch)
      Multimodal.MediaRow(2L, "audio", ppmBytes.clone(), 8, 8, 1),
      // image kind WITHOUT the magic (the empty/non-ASCII fallback
      // shape): stub leg
      Multimodal.MediaRow(3L, "image",
        "only stub bytes here".getBytes("US-ASCII"), 10, 20, 1))
    val got = Multimodal.extractFeatures(rows.toDS()).collect()
      .map(r => r.media_id -> r).toMap
    assert(got(1L).entropy == 0.0, "PPM row must report PIXEL entropy")
    assert(got(1L).mean_byte == 65.0)
    assert(got(1L).n_bytes == ppmBytes.length.toLong)
    // 64/max(4,2) = 16 => 64x32 thumbnail from the DECODED dims
    assert(got(1L).thumb_w == 64 && got(1L).thumb_h == 32,
      s"thumb must derive from decoded dims: ${got(1L)}")
    assert(got(2L).entropy > 0.0,
      "audio kind must ride the stub leg even with P6-looking bytes")
    assert(got(3L).entropy > 0.0 && got(3L).thumb_w <= 64)
    // truncated payload: the validating decoder must throw, not emit
    // garbage features
    val bad = Multimodal.MediaRow(9L, "image",
      ppmBytes.dropRight(3), 4, 2, 1)
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(Seq(bad).toDS()).collect()
    }
    assert(ex.getMessage != null)
  }

  test("extractFeatures routes image-kind PNG and JPEG magics through " +
      "the real JDK decoders (pixel stats + decoded dims, metadata " +
      "only a hint)") {
    import spark.implicits._
    val flat = Multimodal.PpmImage(4, 2, Array.fill(4 * 2 * 3)(65.toByte))
    val png = Codecs.encodePng(flat)
    val jpg = Codecs.encodeJpeg(flat)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, 999, 999, 1),
      Multimodal.MediaRow(2L, "image", jpg, 999, 999, 1),
      // audio kind with a PNG payload: kind guard keeps it on the stub
      Multimodal.MediaRow(3L, "audio", png.clone(), 8, 8, 1))
    val got = Multimodal.extractFeatures(rows.toDS()).collect()
      .map(r => r.media_id -> r).toMap
    // lossless: constant image decodes to constant pixels — entropy 0
    // proves PIXELS were measured, not the zlib-compressed stream
    assert(got(1L).entropy == 0.0 && got(1L).mean_byte == 65.0)
    assert(got(1L).thumb_w == 64 && got(1L).thumb_h == 32,
      s"thumb must derive from decoded dims: ${got(1L)}")
    // JPEG: dims exact; pixel stats near the flat source within lossy
    // tolerance (and NOT the encoded stream's byte stats)
    assert(got(2L).thumb_w == 64 && got(2L).thumb_h == 32)
    assert(math.abs(got(2L).mean_byte - 65.0) < 4.0, s"${got(2L)}")
    assert(got(3L).entropy > 0.0,
      "audio kind must ride the stub even with PNG-looking bytes")
  }

  test("mediaWithPpm: image rows become valid P6 with aligned " +
      "metadata; audio/video rows untouched") {
    val base = Multimodal.mediaFromDocuments(spark, sf).collect()
      .map(r => r.media_id -> r).toMap
    val m = Multimodal.mediaWithPpm(spark, sf).collect()
    assert(m.length == base.size)
    m.foreach { r =>
      if (r.kind == "image") {
        val img = Multimodal.decodePpm(r.bytes) // validating parse
        assert(img.width == r.width && img.height == r.height,
          s"metadata must match the encoded image: ${r.media_id}")
        assert(img.width == (8 + r.media_id % 9).toInt)
      } else {
        assert(java.util.Arrays.equals(r.bytes, base(r.media_id).bytes)
          && r.width == base(r.media_id).width)
      }
    }
  }
}
