package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

import Multimodal.PpmImage
import Codecs.WavAudio

class CodecsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def randImage(rnd: scala.util.Random): PpmImage = {
    val w = 1 + rnd.nextInt(40)
    val h = 1 + rnd.nextInt(30)
    PpmImage(w, h, Array.fill(w * h * 3)(rnd.nextInt(256).toByte))
  }

  // ---------------- PNG ----------------

  test("PNG: ImageIO encode/decode round-trips pixels exactly") {
    val rnd = new scala.util.Random(160)
    for (_ <- 1 to 30) {
      val img = randImage(rnd)
      val back = Codecs.decodePng(Codecs.encodePng(img))
      assert(back.width == img.width && back.height == img.height)
      assert(java.util.Arrays.equals(back.pixels, img.pixels))
    }
  }

  test("PNG: ImageIO agrees byte-for-byte with the independent " +
    "reference decoder on encoder-chosen filters") {
    val rnd = new scala.util.Random(161)
    for (_ <- 1 to 30) {
      val img = randImage(rnd)
      val png = Codecs.encodePng(img)
      val a = Codecs.decodePng(png)
      val b = PngRefDecoder.decode(png)
      assert(a.width == b.width && a.height == b.height)
      assert(java.util.Arrays.equals(a.pixels, b.pixels))
    }
  }

  test("PNG: every filter type (None/Sub/Up/Average/Paeth) decodes " +
    "correctly in BOTH decoders") {
    val rnd = new scala.util.Random(162)
    for (filter <- 0 to 4; _ <- 1 to 5) {
      val img = randImage(rnd)
      val png = PngRefDecoder.encodeWithFilter(img, filter)
      val viaJdk = Codecs.decodePng(png)
      val viaRef = PngRefDecoder.decode(png)
      assert(java.util.Arrays.equals(viaJdk.pixels, img.pixels),
        s"ImageIO mis-decoded filter $filter")
      assert(java.util.Arrays.equals(viaRef.pixels, img.pixels),
        s"reference decoder mis-decoded filter $filter")
    }
  }

  test("PNG: malformed streams are rejected loudly") {
    val good = Codecs.encodePng(PpmImage(3, 2, Array.fill(18)(9.toByte)))
    intercept[IllegalArgumentException](
      Codecs.decodePng("nope".getBytes))
    intercept[Exception](Codecs.decodePng(good.take(20))) // truncated
    // flipped payload byte: the reference decoder's CRC check trips
    val corrupt = good.clone()
    corrupt(good.length / 2) = (corrupt(good.length / 2) ^ 0x55).toByte
    intercept[Exception](PngRefDecoder.decode(corrupt))
  }

  // ---------------- JPEG ----------------

  test("JPEG: decoded dimensions are exact; decode is deterministic; " +
    "pixel values land within lossy tolerance on a smooth image") {
    val rnd = new scala.util.Random(163)
    for (_ <- 1 to 10) {
      val w = 8 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(30)
      // smooth horizontal gradient: JPEG should reproduce it closely
      val base = rnd.nextInt(128)
      val px = Array.tabulate(w * h * 3) { i =>
        val x = (i / 3) % w
        (base + x * 64 / w).toByte
      }
      val jpg = Codecs.encodeJpeg(PpmImage(w, h, px))
      val a = Codecs.decodeJpeg(jpg)
      val b = Codecs.decodeJpeg(jpg)
      assert(a.width == w && a.height == h)
      assert(java.util.Arrays.equals(a.pixels, b.pixels))
      val meanSrc = px.map(_ & 0xff).map(_.toLong).sum.toDouble / px.length
      val meanDec =
        a.pixels.map(_ & 0xff).map(_.toLong).sum.toDouble / a.pixels.length
      assert(math.abs(meanSrc - meanDec) < 4.0,
        s"JPEG mean drifted: $meanSrc vs $meanDec")
    }
  }

  test("JPEG: non-JPEG bytes are rejected") {
    intercept[IllegalArgumentException](
      Codecs.decodeJpeg("RIFFxxxxWAVE".getBytes))
  }

  // ---------------- WAV ----------------

  test("WAV: encode/decode round-trips samples, rate, channels exactly") {
    val rnd = new scala.util.Random(164)
    for (channels <- Seq(1, 2); _ <- 1 to 10) {
      val n = channels * (1 + rnd.nextInt(500))
      val a = WavAudio(8000 + rnd.nextInt(40000), channels,
        Array.fill(n)(rnd.nextInt(65536).toShort))
      val back = Codecs.decodeWav(Codecs.encodeWav(a))
      assert(back.sampleRate == a.sampleRate)
      assert(back.channels == a.channels)
      assert(java.util.Arrays.equals(back.samples, a.samples))
    }
  }

  test("WAV: unknown chunks are skipped and odd chunks padded, like " +
    "real files") {
    val samples = Array[Short](100, -200, 300, -400)
    // hand-assemble: fmt, an odd-length LIST chunk (padded), data
    val fmt = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16).array()
    val list = "INFOabc".getBytes // 7 bytes -> odd, needs a pad byte
    val dataLen = samples.length * 2
    val body = 4 + (8 + 16) + (8 + list.length + 1) + (8 + dataLen)
    val buf = ByteBuffer.allocate(8 + body).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(body).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).put(fmt)
    buf.put("LIST".getBytes).putInt(list.length).put(list).put(0.toByte)
    buf.put("data".getBytes).putInt(dataLen)
    samples.foreach(buf.putShort)
    val wav = Codecs.decodeWav(buf.array())
    assert(wav.sampleRate == 8000 && wav.channels == 1)
    assert(wav.samples.toSeq == samples.toSeq)
  }

  test("WAV: the hand-written parser agrees with the JDK's own " +
    "AudioSystem parser (an independent implementation) on random " +
    "streams") {
    import javax.sound.sampled.AudioSystem
    val rnd = new scala.util.Random(166)
    for (_ <- 1 to 15) {
      val channels = 1 + rnd.nextInt(2)
      val n = channels * (1 + rnd.nextInt(300))
      val a = WavAudio(8000 + rnd.nextInt(40000), channels,
        Array.fill(n)(rnd.nextInt(65536).toShort))
      val bytes = Codecs.encodeWav(a)
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate.toInt == a.sampleRate)
      assert(fmt.getChannels == channels)
      assert(fmt.getSampleSizeInBits == 16)
      assert(!fmt.isBigEndian)
      val raw = in.readAllBytes()
      val jdk = new Array[Short](raw.length / 2)
      ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        .asShortBuffer().get(jdk)
      val ours = Codecs.decodeWav(bytes)
      assert(java.util.Arrays.equals(jdk, ours.samples),
        "sample disagreement between the two parsers")
    }
  }

  test("WAV: malformed or unsupported streams are rejected loudly") {
    val good = Codecs.encodeWav(WavAudio(8000, 1, Array[Short](1, 2, 3, 4)))
    def mutate(f: Array[Byte] => Array[Byte]): Array[Byte] = f(good.clone())

    // not RIFF/WAVE at all
    intercept[IllegalArgumentException](Codecs.decodeWav("x".getBytes))
    // RIFF size disagrees with stream length
    intercept[IllegalArgumentException](Codecs.decodeWav(mutate { b =>
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).putInt(4, 999); b
    }))
    // truncated mid-chunk
    intercept[IllegalArgumentException](Codecs.decodeWav(mutate { b =>
      val t = b.dropRight(3)
      ByteBuffer.wrap(t).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(4, t.length - 8)
      t
    }))
    // non-PCM format code
    intercept[IllegalArgumentException](Codecs.decodeWav(mutate { b =>
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(20, 3.toShort); b // 3 = IEEE float
    }))
    // 8-bit samples unsupported
    intercept[IllegalArgumentException](Codecs.decodeWav(mutate { b =>
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      bb.putShort(34, 8.toShort) // bits
      bb.putShort(32, 1.toShort) // blockAlign = channels*1
      bb.putInt(28, 8000)        // byteRate
      b
    }))
    // data before fmt
    val noFmt = {
      val dataLen = 4
      val body = 4 + 8 + dataLen
      val bb = ByteBuffer.allocate(8 + body).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(body).put("WAVE".getBytes)
      bb.put("data".getBytes).putInt(dataLen).putShort(1).putShort(2)
      bb.array()
    }
    intercept[IllegalArgumentException](Codecs.decodeWav(noFmt))
    // duplicate data chunk: would silently truncate the signal to the
    // LAST chunk if accepted — must reject instead
    val twoData = {
      val extra = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        .put("data".getBytes).putInt(4).putShort(9).putShort(9).array()
      val b = good ++ extra
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(4, b.length - 8)
      b
    }
    intercept[IllegalArgumentException](Codecs.decodeWav(twoData))
  }

  // ---------------- Y4M ----------------

  test("Y4M: encode/parse round-trips geometry and plane sums; frame " +
    "seek reads the right frame") {
    val rnd = new scala.util.Random(165)
    for (_ <- 1 to 10) {
      val w = 1 + rnd.nextInt(8)
      val h = 1 + rnd.nextInt(8)
      val nf = 1 + rnd.nextInt(10)
      val frames =
        Seq.fill(nf)(Array.fill(3 * w * h)(rnd.nextInt(256).toByte))
      val s = Codecs.parseY4m(Codecs.encodeY4m(w, h, 30, 1, frames))
      assert(s.width == w && s.height == h && s.nFrames == nf)
      for (f <- 0 until nf) {
        val (y, u, v) = Codecs.y4mPlaneSums(s, f)
        val n = w * h
        def sum(off: Int) =
          frames(f).slice(off * n, (off + 1) * n).map(_ & 0xff)
            .map(_.toLong).sum
        assert(y == sum(0) && u == sum(1) && v == sum(2),
          s"frame $f plane sums")
      }
    }
  }

  test("Y4M: frame delta matches a direct per-pixel computation and " +
    "only ever reads the two seeked frames") {
    val rnd = new scala.util.Random(167)
    for (_ <- 1 to 8) {
      val w = 1 + rnd.nextInt(6)
      val h = 1 + rnd.nextInt(6)
      val nf = 2 + rnd.nextInt(8)
      val frames =
        Seq.fill(nf)(Array.fill(3 * w * h)(rnd.nextInt(256).toByte))
      val s = Codecs.parseY4m(Codecs.encodeY4m(w, h, 30, 1, frames))
      for (f <- 0 until nf - 1) {
        val want = (0 until w * h).map(j =>
          math.abs((frames(f + 1)(j) & 0xff) - (frames(f)(j) & 0xff))
            .toLong).sum
        assert(Codecs.y4mFrameDeltaY(s, f) == want, s"delta at frame $f")
      }
      intercept[IllegalArgumentException](
        Codecs.y4mFrameDeltaY(s, nf - 1)) // needs a successor frame
    }
  }

  test("q166 modality budget: one row per modality, weights normalize, " +
    "temperature flattens the shares") {
    val q166 = CodecQueries.defs
      .find(_.name == "q166_modality_token_budget").get
    val rows = q166.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq("audio", "image", "video"))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
    // alpha < 1 compresses the spread: max/min of weights < of shares
    def spread(v: Seq[Double]) = v.max / v.min
    assert(spread(rows.map(_._5).toSeq) < spread(rows.map(_._4).toSeq),
      "temperature mixing did not flatten")
  }

  test("Y4M: header parameters parse; unsupported colourspace and " +
    "malformed streams are rejected loudly") {
    val frame = Array.fill(3 * 2 * 2)(5.toByte)
    val good = Codecs.encodeY4m(2, 2, 7, 2, Seq(frame))
    val s = Codecs.parseY4m(good)
    assert(s.fpsNum == 7 && s.fpsDen == 2)

    intercept[IllegalArgumentException](
      Codecs.parseY4m("JUNK".getBytes)) // magic
    // C420 (the spec default) must be rejected, not mis-sliced
    val c420 = ("YUV4MPEG2 W2 H2 F30:1 C420\n" + "FRAME\n")
      .getBytes ++ Array.fill(6)(0.toByte)
    intercept[IllegalArgumentException](Codecs.parseY4m(c420))
    // unterminated header
    intercept[IllegalArgumentException](
      Codecs.parseY4m("YUV4MPEG2 W2 H2".getBytes))
    // body not a multiple of the frame size
    intercept[IllegalArgumentException](
      Codecs.parseY4m(good.dropRight(1)))
    // corrupt FRAME marker at a seek target
    val corrupt = good.clone()
    val markerAt = good.length - frame.length - 6
    corrupt(markerAt) = 'X'.toByte
    intercept[IllegalArgumentException](
      Codecs.y4mPlaneSums(Codecs.parseY4m(corrupt), 0))
    // out-of-range frame index
    intercept[IllegalArgumentException](Codecs.y4mPlaneSums(s, 1))
    // header dims that wrap Int must be a precise rejection, not a
    // false divisibility pass on the wrapped frame size
    intercept[IllegalArgumentException](
      Codecs.parseY4m("YUV4MPEG2 W46341 H46341 C444\n".getBytes))
  }

  // ---------------- dispatch ----------------

  test("mediaSummary dispatch: kind routes the family, magic the codec; " +
    "unrecognizable payloads fail loudly") {
    val img = CodecQueries.synthImage(6L)
    assert(CodecQueries.mediaSummary("image",
      Multimodal.ppmEncode(img)).codec == "ppm")
    assert(CodecQueries.mediaSummary("image",
      Codecs.encodePng(img)).codec == "png")
    val j = CodecQueries.mediaSummary("image", Codecs.encodeJpeg(img))
    assert(j.codec == "jpeg" && j.exactSum == -1L
      && j.width == img.width && j.height == img.height)
    assert(CodecQueries.mediaSummary("audio",
      Codecs.encodeWav(CodecQueries.synthWav(7L))).codec == "wav")
    assert(CodecQueries.mediaSummary("video",
      CodecQueries.synthY4m(8L)).codec == "y4m")

    // the PNG/PPM leg and the formula agree: decoded content sum is the
    // synthesis formula's sum
    val expected = (0 until img.width * img.height * 3)
      .map(jj => (6L * 7 + jj.toLong * 131) % 256).sum
    assert(CodecQueries.mediaSummary("image",
      Codecs.encodePng(img)).exactSum == expected)
    assert(CodecQueries.mediaSummary("image",
      Multimodal.ppmEncode(img)).exactSum == expected)

    // kind guard: an audio payload that spells P6 is NOT an image
    intercept[IllegalArgumentException](
      CodecQueries.mediaSummary("audio", "P6\n1 1\n255\nabc".getBytes))
    // an image payload carrying a WAV stream has no image magic
    intercept[IllegalArgumentException](CodecQueries.mediaSummary("image",
      Codecs.encodeWav(CodecQueries.synthWav(1L))))
    intercept[IllegalArgumentException](
      CodecQueries.mediaSummary("text", Array[Byte](1)))
  }

  // ---------------- query-level ----------------

  test("q160-q163 run end to end on sf0.001 with the expected shapes") {
    val byName = CodecQueries.defs.map(q => q.name -> q).toMap
    val png = byName("q160_png_decode").fn(spark, sf).collect()
    assert(png.length > 100)
    // spot-check one row against the synthesis formula by hand
    val row = png.minBy(_.getLong(0))
    val id = row.getLong(0)
    val w = (16 + id % 17).toInt
    val h = (12 + id % 13).toInt
    assert(row.getInt(1) == w && row.getInt(2) == h)
    val rSum = (0 until w * h).map(p => (id * 7 + 3L * p * 131) % 256).sum
    assert(row.getLong(3) == rSum, "decoded r_sum != formula")

    val wav = byName("q161_wav_features").fn(spark, sf).collect()
    assert(wav.length > 100)
    wav.foreach { r =>
      assert(r.getInt(4) <= 2000, "peak beyond synthesis range")
      assert(r.getLong(7) > 0, "a 997-step signal must cross zero")
    }

    val y4m = byName("q162_y4m_frame_sample").fn(spark, sf).collect()
    assert(y4m.length > 300) // >= 3 frames per video row
    val dispatch = byName("q163_codec_dispatch").fn(spark, sf).collect()
    assert(dispatch.length == 500)
    val codecs = dispatch.map(_.getString(1)).toSet
    assert(codecs == Set("ppm", "png", "jpeg", "wav", "y4m"))
    // every lossless row carries a real content sum
    dispatch.filter(_.getString(1) != "jpeg")
      .foreach(r => assert(r.getLong(5) >= 0))
  }

  test("VAD: hand-built loud/silent pattern yields exactly the " +
    "expected segments; partial tail frame is ignored") {
    val F = CodecQueries.VadFrame
    def frames(pattern: String): Array[Short] =
      pattern.toSeq.flatMap {
        case 'L' => Seq.fill[Short](F)(3000) // 32*9M = 288M > T
        case _   => Seq.fill[Short](F)(0)
      }.toArray
    // loud-loud-silent-loud-silent-silent-loud  -> [0,1], [3,3], [6,6]
    val segs = CodecQueries.vadSegmentsOf(7L,
      frames("LLsLssL") ++ Array.fill[Short](F / 2)(3000)) // partial tail
    assert(segs.map(s => (s._2, s._3, s._4)) ==
      Seq((0L, 1L, 2L), (3L, 3L, 1L), (6L, 6L, 1L)))
    assert(segs.forall(_._5 > 0))
    assert(segs.head._5 == 2L * F * 3000L * 3000L, "segment energy mass")
    // all-silent and too-short streams produce nothing
    assert(CodecQueries.vadSegmentsOf(1L, frames("sss")).isEmpty)
    assert(CodecQueries.vadSegmentsOf(1L,
      Array.fill[Short](F - 1)(3000)).isEmpty)
  }

  test("q169: planted cross-codec twins dedup at hamming 0, and the " +
    "banded candidates lose nothing vs brute force") {
    val q169 = CodecQueries.defs
      .find(_.name == "q169_image_phash_pairs").get
    val pairs = q169.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.CacheScope.flush(spark)
    // every planted twin (ids 6k and 6k+3, same pixels via PPM vs PNG)
    // must be found with hamming EXACTLY 0 — lossless decode
    import spark.implicits._
    val imageIds = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .select("doc_id").as[Long].collect().toSet
    val planted = imageIds.filter(id => id % 6 == 0
      && imageIds.contains(id + 3)).map(id => (id, id + 3))
    assert(planted.nonEmpty)
    planted.foreach { p =>
      val hit = pairs.find(r => (r._1, r._2) == p)
      assert(hit.exists(_._3 == 0L), s"planted twin $p: $hit")
    }
    // banding is complete at the verify threshold: brute-force the
    // hashes and compare pair sets
    val hashes = imageIds.toSeq.sorted.map { id =>
      val cid = id / 6
      val w = (16 + cid % 17).toInt
      val h = (12 + cid % 13).toInt
      id -> CodecQueries.dHashOf(Multimodal.PpmImage(w, h,
        Array.tabulate(w * h * 3)(j =>
          ((cid * 7 + j.toLong * 131) % 256).toByte)))
    }
    val brute = for {
      (a, ha) <- hashes
      (b, hb) <- hashes
      if a < b && java.lang.Long.bitCount(ha ^ hb) <=
        CodecQueries.PhashMaxHamming
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb).toLong)
    assert(pairs.toSeq.sorted == brute.sorted)
  }

  test("q172/q173 gates: both branches fire; planted blanks are " +
    "exactly the constant-pixel ids and variance is integer-exact") {
    val byName = CodecQueries.defs.map(q => q.name -> q).toMap
    val rate = byName("q172_speech_rate_gate").fn(spark, sf).collect()
    assert(rate.exists(_.getBoolean(4)) && rate.exists(!_.getBoolean(4)),
      "speech-rate band did not split the corpus")
    rate.foreach { r => // rate_x1000 consistent with its inputs
      assert(r.getLong(3) == r.getLong(1) * 1000000L / r.getLong(2))
    }
    val blank = byName("q173_blank_image_gate").fn(spark, sf).collect()
    val blanks = blank.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    assert(blanks.nonEmpty)
    assert(blanks == blank.map(_.getLong(0))
        .filter(_ % CodecQueries.BlankImageMod == 0).toSet,
      "blank set must be exactly the planted constant images")
    // constant image: zero variance in the integer form
    blank.filter(_.getBoolean(4)).foreach { r =>
      assert(r.getLong(1) * r.getLong(3) == r.getLong(2) * r.getLong(2),
        s"planted blank has nonzero variance: $r")
    }
  }

  test("q165 pair curation: every rule fires both ways and kept is " +
    "their conjunction") {
    val q165 = CodecQueries.defs.find(_.name == "q165_pair_curation").get
    val rows = q165.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
    assert(rows.length == 500)
    // media gate: exactly the corruption rule's ids fail to decode
    assert(rows.filter(!_._3).map(_._1).toSet ==
      rows.map(_._1).filter(_ % 31 == 0).toSet)
    // each modality's size floor splits its synthesis range
    for (kind <- Seq("image", "audio", "video")) {
      val ofKind = rows.filter(r => r._2 == kind && r._3)
      assert(ofKind.exists(_._4) && ofKind.exists(!_._4),
        s"$kind size floor did not split the corpus")
    }
    // caption rules fire both ways too
    assert(rows.exists(_._5) && rows.exists(!_._5))
    // kept is exactly the conjunction
    rows.foreach(r => assert(r._6 == (r._3 && r._4 && r._5)))
    assert(rows.exists(_._6), "nothing survived pair curation")
  }

  test("q174 clip gate: both branches fire and counts match a direct " +
    "recount of the synthesis samples") {
    val q174 = CodecQueries.defs.find(_.name == "q174_audio_clip_gate").get
    val rows = q174.fn(spark, sf).collect()
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)),
      "clip threshold did not split the corpus")
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (256 + id % 257).toInt
      var nClip = 0L; var peak = 0L
      for (t <- 0 until n) {
        val s = math.abs((id * 31 + t.toLong * 997) % 4001 - 2000)
        if (s >= CodecQueries.ClipAbs) nClip += 1
        if (s > peak) peak = s
      }
      assert(r.getLong(1) == n && r.getLong(2) == nClip
        && r.getLong(3) == nClip * 1000 / n && r.getInt(4) == peak
        && r.getBoolean(5) ==
          (nClip * 1000 < CodecQueries.ClipPermille * n),
        s"clip row disagrees with direct recount: $r")
    }
  }

  test("q175 letterbox: detected borders are exactly the planted ones " +
    "and zero everywhere else") {
    val q175 = CodecQueries.defs.find(_.name == "q175_letterbox_crop").get
    val rows = q175.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val h = 12 + id % 13
      if (id % CodecQueries.LetterboxMod == 0) {
        val b = 1 + id % 4
        assert(r.getLong(3) == b && r.getLong(4) == b
          && r.getLong(5) == h - 2 * b && r.getBoolean(6),
          s"planted letterbox not detected exactly: $r")
      } else {
        assert(r.getLong(3) == 0 && r.getLong(4) == 0
          && r.getLong(5) == h && !r.getBoolean(6),
          s"false border on an unplanted image: $r")
      }
    }
    assert(rows.exists(_.getBoolean(6)), "no planted letterbox in corpus")
  }

  test("q176 keyframes: per-video top-K by delta with the earlier-frame " +
    "tie-break, against a brute-force rank of the q167 deltas") {
    val byName = CodecQueries.defs.map(q => q.name -> q).toMap
    val deltas = byName("q167_shot_boundaries").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = deltas.groupBy(_._1).toSeq.flatMap { case (id, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(CodecQueries.KeyframeK)
        .zipWithIndex.map { case ((_, fi, yd), k) =>
          (id, (k + 1).toLong, fi + 1, yd)
        }
    }.toSet
    val got = byName("q176_keyframe_select").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == brute)
  }

  test("degenerate inputs: border scan on 1-row/fully-uniform images, " +
    "resample on empty and collapsing rates, curation on empty/garbage") {
    import spark.implicits._
    // fully-uniform image reports all-border (h, 0); 1-row images both ways
    val uni = PpmImage(4, 3, Array.fill(36)(7.toByte))
    assert(CodecQueries.uniformRowBorders(uni) == (3, 0))
    val oneRowU = PpmImage(5, 1, Array.fill(15)(0.toByte))
    assert(CodecQueries.uniformRowBorders(oneRowU) == (1, 0))
    val oneRowN = PpmImage(5, 1, Array.tabulate(15)(_.toByte))
    assert(CodecQueries.uniformRowBorders(oneRowN) == (0, 0))
    // resample: empty input, and a downsample so extreme n_out == 0
    assert(Codecs.resampleNearest(Array.empty[Short], 8000, 16000).isEmpty)
    assert(Codecs.resampleNearest(Array[Short](1, 2, 3), 48000, 1).isEmpty)
    intercept[IllegalArgumentException](
      Codecs.resampleNearest(Array[Short](1), 0, 16000))
    // clip/gray stats on empty content
    assert(CodecQueries.clipStats(Array.empty[Short]) == (0L, 0))
    assert(CodecQueries.grayStats(PpmImage(0, 0, Array.empty[Byte]))
      == (0L, 0L, 0L))
    // the curation gate on an empty table and on garbage payloads
    val emptyMedia = Seq.empty[(Long, String, Array[Byte])]
      .toDF("media_id", "kind", "bytes")
    assert(CodecQueries.mediaCurationDecisions(emptyMedia).count() == 0)
    val garbage = Seq(
      (1L, "image", "not an image".getBytes),
      (2L, "audio", Array.empty[Byte]),
      (3L, "bogus-kind", "x".getBytes)).toDF("media_id", "kind", "bytes")
    val dec = CodecQueries.mediaCurationDecisions(garbage).collect()
      .map(d => d.media_id -> d.reason).toMap
    assert(dec == Map(1L -> "quarantined", 2L -> "quarantined",
      3L -> "quarantined"))
  }

  test("q183 downmix: stereo interleave decodes channel-true, the " +
    "truncating division rule matches DuckDB //, and checksums match " +
    "a direct formula recount") {
    // the division rule on negative odd sums: toward zero, not floor
    assert((-5) / 2 == -2 && 5 / 2 == 2)
    // hand-built stereo round-trip: L/R stay in their slots
    val st = WavAudio(8000, 2, Array[Short](10, -3, 7, 5, -9, -4))
    val back = Codecs.decodeWav(Codecs.encodeWav(st))
    assert(back.channels == 2 &&
      java.util.Arrays.equals(back.samples, st.samples))
    val rows = CodecQueries.defs
      .find(_.name == "q183_stereo_downmix").get.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val nf = (200 + id % 211).toInt
      assert(r.getLong(2) == nf)
      var sumAbs = 0L; var energy = 0L
      for (t <- 0 until nf) {
        val l = ((id * 31 + t.toLong * 997) % 4001 - 2000).toInt
        val rr = ((id * 47 + t.toLong * 641) % 4001 - 2000).toInt
        val m = (l + rr) / 2
        sumAbs += math.abs(m.toLong); energy += m.toLong * m
      }
      assert(r.getLong(3) == sumAbs && r.getLong(4) == energy,
        s"downmix checksum diverged for $id")
    }
  }

  test("q180 static gate: the static set is exactly the planted ids, " +
    "planted deltas are zero through the real codec, and no formula " +
    "video is anywhere near the floor") {
    val rows = CodecQueries.defs
      .find(_.name == "q180_static_video_gate").get.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val statics = rows.filter(_._5).map(_._1).toSet
    assert(statics.nonEmpty)
    assert(statics ==
      rows.map(_._1).filter(_ % CodecQueries.StaticVideoMod == 0).toSet)
    rows.filter(_._5).foreach { r =>
      assert(r._3 == 0L && r._4 == 0L, s"planted static has motion: $r")
    }
    rows.filterNot(_._5).foreach { r =>
      // formula deltas are 101 or 155 per pixel — two orders above the
      // floor, so the gate has real margin
      assert(r._4 > 0, s"non-planted video with zero max delta: $r")
    }
  }

  test("q177 resample: identity at 16 kHz, exact x2 duplication from " +
    "8 kHz, and NN kernel agreement on random streams") {
    val rows = CodecQueries.defs
      .find(_.name == "q177_audio_resample").get.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(Set(8000, 12000, 16000, 20000).subsetOf(rows.map(_._2).toSet))
    rows.foreach { case (id, rate, nIn, nOut, sumAbs, energy) =>
      val wav = CodecQueries.synthWav(id)
      val inAbs = wav.samples.map(s => math.abs(s.toLong)).sum
      val inE = wav.samples.map(s => s.toLong * s).sum
      assert(nOut == nIn * CodecQueries.ResampleRate / rate)
      if (rate == 16000)
        assert(sumAbs == inAbs && energy == inE, s"identity leg broke: $id")
      if (rate == 8000) // each input sample appears exactly twice
        assert(sumAbs == 2 * inAbs && energy == 2 * inE,
          s"x2 upsample leg broke: $id")
    }
    // the kernel itself, off-corpus: NN index map on random streams
    val rnd = new scala.util.Random(177)
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(500)
      val src = 1 + rnd.nextInt(48000)
      val dst = 1 + rnd.nextInt(48000)
      val in = Array.fill(n)(rnd.nextInt(65536).toShort)
      val out = Codecs.resampleNearest(in, src, dst)
      assert(out.length == (n.toLong * dst / src).toInt)
      out.zipWithIndex.foreach { case (v, t) =>
        assert(v == in((t.toLong * src / dst).toInt))
      }
    }
  }

  // ---------------- AVI / MJPEG ----------------

  test("AVI/MJPEG: mux/demux round-trips geometry, frame count and the " +
    "exact JPEG chunk bytes; frames decode to container dims") {
    val rnd = new scala.util.Random(185)
    for (_ <- 1 to 10) {
      val w = 8 + rnd.nextInt(24)
      val h = 8 + rnd.nextInt(16)
      val nf = 1 + rnd.nextInt(8)
      val jpegs = (0 until nf).map { _ =>
        Codecs.encodeJpeg(
          PpmImage(w, h, Array.fill(w * h * 3)(rnd.nextInt(256).toByte)))
      }
      val avi = Codecs.encodeAviMjpeg(w, h, 25, jpegs)
      assert(Codecs.isRiffAvi(avi) && !Codecs.isRiffWave(avi))
      val v = Codecs.parseAviMjpeg(avi)
      assert(v.width == w && v.height == h && v.fps == 25 &&
        v.nFrames == nf)
      (0 until nf).foreach { i =>
        // the demuxed chunk is the EXACT encoder output — the container
        // adds framing, never touches the codec bytes
        assert(java.util.Arrays.equals(v.frameJpeg(i), jpegs(i)))
        val img = Codecs.decodeJpeg(v.frameJpeg(i))
        assert(img.width == w && img.height == h)
      }
      intercept[IllegalArgumentException](v.frameJpeg(nf))
    }
  }

  test("AVI/MJPEG: malformed or unsupported containers are rejected " +
    "loudly") {
    val good = Codecs.encodeAviMjpeg(8, 8, 25, Seq(Codecs.encodeJpeg(
      PpmImage(8, 8, Array.tabulate(192)(i => (i % 256).toByte)))))
    // not RIFF/AVI at all
    intercept[IllegalArgumentException](
      Codecs.parseAviMjpeg("YUV4MPEG2 W4 H4\n".getBytes))
    // a WAV is RIFF but not AVI
    intercept[IllegalArgumentException](Codecs.parseAviMjpeg(
      Codecs.encodeWav(WavAudio(8000, 1, Array[Short](1, 2)))))
    // truncation breaks the RIFF size check
    intercept[IllegalArgumentException](
      Codecs.parseAviMjpeg(good.dropRight(1)))
    // flip the strh handler to a codec we cannot decode -> loud reject
    val badHandler = good.clone()
    val idx = {
      var i = 0
      var at = -1
      while (at < 0 && i < badHandler.length - 8) {
        if (badHandler(i) == 'v' && badHandler(i + 1) == 'i' &&
          badHandler(i + 2) == 'd' && badHandler(i + 3) == 's') at = i + 4
        i += 1
      }
      at
    }
    assert(idx > 0)
    "XVID".getBytes.zipWithIndex.foreach { case (b, j) =>
      badHandler(idx + j) = b }
    intercept[IllegalArgumentException](Codecs.parseAviMjpeg(badHandler))
    // corrupt a movi chunk id so idx1 disagrees with the walk
    val badMovi = good.clone()
    val dc = {
      var i = 12
      var at = -1
      while (at < 0 && i < badMovi.length - 4) {
        if (badMovi(i) == '0' && badMovi(i + 1) == '0' &&
          badMovi(i + 2) == 'd' && badMovi(i + 3) == 'c') at = i
        i += 1
      }
      at
    }
    assert(dc > 0)
    badMovi(dc) = 'x'
    intercept[IllegalArgumentException](Codecs.parseAviMjpeg(badMovi))
  }

  test("q185 synthesis: static plants decode to exactly zero delta, " +
    "non-static frames land far from zero; pixel stats within lossy " +
    "tolerance; the dispatch routes the container") {
    for (id <- 0L to 40L) {
      val bytes = CodecQueries.synthAviMjpeg(id)
      val m = CodecQueries.mediaSummary("video", bytes)
      assert(m.codec == "mjpeg" && m.exactSum == -1L)
      val v = Codecs.parseAviMjpeg(bytes)
      assert(m.width == v.width && m.height == v.height &&
        m.nUnits == v.nFrames.toLong)
      val frames = (0 until v.nFrames).map(i =>
        Codecs.decodeJpeg(v.frameJpeg(i)))
      val deltas = frames.sliding(2).collect { case Seq(a, b) =>
        a.pixels.zip(b.pixels).map { case (x, y) =>
          math.abs((x & 0xff) - (y & 0xff)).toLong }.sum
      }.toSeq
      if (id % CodecQueries.StaticVideoMod == 0)
        assert(deltas.forall(_ == 0L),
          s"static plant $id decoded a nonzero delta: $deltas")
      else {
        // source frames differ by 113 per byte mod 256 — far beyond any
        // quantization collapse; demand a wide margin, not just nonzero
        val floor = v.width.toLong * v.height * 3 * 8
        assert(deltas.forall(_ > floor),
          s"non-static $id deltas $deltas not above floor $floor")
      }
      // lossy tolerance on the mean of each decoded frame vs its source
      frames.zipWithIndex.foreach { case (img, f) =>
        val srcMean = (0 until v.width * v.height * 3).map(j =>
          (id * 17 + (if (id % CodecQueries.StaticVideoMod == 0) 0
                      else f).toLong * 113 + j.toLong * 11) % 256)
          .sum.toDouble / (v.width * v.height * 3)
        val decMean = img.pixels.map(_ & 0xff).map(_.toLong)
          .sum.toDouble / img.pixels.length
        assert(math.abs(srcMean - decMean) < 24.0,
          s"JPEG frame mean drifted on $id/$f: $srcMean vs $decMean")
      }
    }
  }

  test("q185 runs end to end on sf0.001: statics are exactly the " +
    "planted ids, dims_ok everywhere, dispatch says mjpeg") {
    val rows = CodecQueries.defs
      .find(_.name == "q185_mjpeg_static_gate").get.fn(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "mjpeg")
      assert(r.getInt(2) == (8 + id % 5).toInt)
      assert(r.getInt(3) == (8 + id % 4).toInt)
      assert(r.getLong(4) == 3 + id % 7)
      assert(r.getBoolean(5), s"dims_ok false for $id")
      assert(r.getBoolean(6) == (id % CodecQueries.StaticVideoMod == 0),
        s"is_static wrong for $id")
    }
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)),
      "both gate branches must fire on the corpus")
  }

  test("q191 synthesis + prefilter BYTE-TOUCH: cuts are exactly the " +
    "planted scene cadence and the SHIPPED detector pays exactly " +
    "cuts+1 decodes — the one-frame cache carries across scene " +
    "interiors, so decode work is O(cuts), never O(frames)") {
    var sawCut = false; var sawNoCut = false
    for (id <- 2L to 122L by 3L) { // the doc_id % 3 == 2 family
      val v = Codecs.parseAviMjpeg(CodecQueries.synthAviMjpegScenes(id))
      val nf = (4 + id % 7).toInt
      val c = (2 + (id / 3) % 3).toInt
      assert(v.nFrames == nf)
      val plantedCuts = (1 until nf).filter(_ % c == 0)
      // the SHARED rule implementation — the probe and query run this
      val (cuts, decodedFrames, decodedBytes) = CodecQueries.detectCuts(v)
      assert(cuts == plantedCuts, s"id=$id nf=$nf c=$c")
      // the tightened byte-touch claim: the first cut decodes its
      // pair, every later cut decodes ONE frame (its left side is the
      // cache, re-pointed along the byte-identical scene interior)
      val wantDec =
        if (plantedCuts.isEmpty) 0L else plantedCuts.length + 1L
      assert(decodedFrames == wantDec,
        s"id=$id nf=$nf c=$c: $decodedFrames decodes for " +
          s"${plantedCuts.length} cuts (want $wantDec)")
      val allBytes = (0 until nf).map(v.frameJpeg(_).length.toLong).sum
      if (plantedCuts.nonEmpty) {
        sawCut = true
        if (nf > plantedCuts.length + 1)
          assert(decodedBytes < allBytes,
            s"id=$id decoded $decodedBytes of $allBytes — prefilter idle")
      } else {
        sawNoCut = true
        assert(decodedBytes == 0L,
          s"id=$id single-scene video paid $decodedBytes decode bytes")
      }
    }
    assert(sawCut && sawNoCut,
      "corpus must exercise both the cut and the single-scene leg")
  }
}
