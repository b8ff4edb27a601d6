package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

import Multimodal.PpmImage

/** REAL codecs, JDK-only. Earlier rounds carried "JPEG/PNG/audio codecs
  * are not in this environment" as an adjudicated gap — but the JDK
  * itself ships codecs: `javax.imageio` (java.desktop) decodes and
  * encodes PNG and JPEG (zlib inflate + PNG defiltering, baseline JPEG
  * Huffman/DCT), headless. This module retires the stub adjudication:
  *
  *   - PNG: encode/decode via ImageIO. Lossless, so a DuckDB oracle can
  *     reconstruct every pixel of a synthesized image and hash-check the
  *     decode end to end (q160) — same discipline as the PPM leg (q159).
  *   - JPEG: encode/decode via ImageIO. Lossy — decoded pixels are
  *     decoder-defined and NOT SQL-reconstructible, so its oracle checks
  *     the exactly-determined outputs only (decoded dimensions, pixel
  *     count); pixel statistics are asserted with tolerances in the spec.
  *   - WAV: a hand-written VALIDATING RIFF/PCM parser (chunk walk, pad
  *     bytes, unknown-chunk skip, fmt-before-data, 16-bit PCM). Needs no
  *     library at all; integer samples make the oracle exact (q161).
  *   - Y4M (YUV4MPEG2, ffmpeg's raw-video interchange format): a
  *     validating header parse + O(1) frame seek — frames are fixed-size
  *     in this container, so sampling frame k of n touches only frame
  *     k's bytes. That IS the 100 TB story for frame sampling: a demuxer
  *     that reads what it samples, not the whole stream (q162).
  *
  * All decoders fail LOUDLY on malformed streams — a real ingest wants
  * the error, not a silent garbage frame. Batched per partition by the
  * callers (the Scala analogue of mapInPandas), same seam as
  * [[Multimodal.extractFeatures]].
  */
object Codecs {
  // Headless AWT (no X server in any executor) and no ImageIO disk
  // cache: by default ImageIO spools streams through temp FILES — a
  // per-row fsync in the decode hot path. Memory-only caching keeps the
  // per-partition loop pure CPU.
  locally {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  // ------------------------------------------------------------------
  // PNG / JPEG via the JDK's ImageIO
  // ------------------------------------------------------------------

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a &&
      b(7) == 0x0a

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte &&
      b(2) == 0xff.toByte

  def isRiffWave(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  def isY4m(b: Array[Byte]): Boolean =
    b.length >= 9 && new String(b, 0, 9,
      java.nio.charset.StandardCharsets.US_ASCII) == "YUV4MPEG2"

  /** Encode row-major interleaved RGB as PNG (JDK writer: 8-bit
    * truecolor, non-interlaced, real zlib deflate).
    */
  def encodePng(img: PpmImage): Array[Byte] = encodeImage(img, "png")

  /** Encode as baseline JPEG (JDK writer, default quality). Lossy. */
  def encodeJpeg(img: PpmImage): Array[Byte] = encodeImage(img, "jpg")

  private def encodeImage(img: PpmImage, fmt: String): Array[Byte] = {
    val bi = new BufferedImage(img.width, img.height,
      BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val p = (y * img.width + x) * 3
        bi.setRGB(x, y, ((img.pixels(p) & 0xff) << 16) |
          ((img.pixels(p + 1) & 0xff) << 8) | (img.pixels(p + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(bi, fmt, bos), s"$fmt: no JDK ImageIO writer")
    bos.toByteArray
  }

  /** Decode a PNG stream to interleaved RGB. Validates the magic first
    * (a clear error beats ImageIO's null), then runs the JDK's real
    * inflate + defilter decoder. Malformed streams throw.
    */
  def decodePng(bytes: Array[Byte]): PpmImage = {
    require(isPng(bytes), "PNG: not a PNG stream (bad signature)")
    decodeImage(bytes, "PNG")
  }

  /** Decode a JPEG stream to interleaved RGB (JDK Huffman/IDCT). The
    * DIMENSIONS are exact; pixel values are decoder-defined (lossy).
    */
  def decodeJpeg(bytes: Array[Byte]): PpmImage = {
    require(isJpeg(bytes), "JPEG: not a JPEG stream (bad SOI marker)")
    decodeImage(bytes, "JPEG")
  }

  private def decodeImage(bytes: Array[Byte], what: String): PpmImage = {
    val bi = ImageIO.read(new ByteArrayInputStream(bytes))
    require(bi != null, s"$what: ImageIO could not decode the stream")
    val w = bi.getWidth
    val h = bi.getHeight
    val out = new Array[Byte](w * h * 3)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      bi.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        out(p) = ((row(x) >> 16) & 0xff).toByte
        out(p + 1) = ((row(x) >> 8) & 0xff).toByte
        out(p + 2) = (row(x) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, out)
  }

  // ------------------------------------------------------------------
  // WAV: RIFF/WAVE, 16-bit PCM. Hand-written validating parser — the
  // container is a chunk list and needs no codec library.
  // ------------------------------------------------------------------

  /** Decoded PCM audio: interleaved 16-bit samples. */
  final case class WavAudio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** Encode interleaved 16-bit PCM as a canonical RIFF/WAVE stream. */
  def encodeWav(a: WavAudio): Array[Byte] = {
    require(a.channels >= 1, s"WAV encode: ${a.channels} channels")
    require(a.samples.length % a.channels == 0,
      s"WAV encode: ${a.samples.length} samples not a multiple of " +
        s"${a.channels} channels")
    val dataLen = a.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    val blockAlign = a.channels * 2
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1) // PCM
      .putShort(a.channels.toShort)
      .putInt(a.sampleRate)
      .putInt(a.sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16) // bits per sample
    buf.put("data".getBytes).putInt(dataLen)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode + VALIDATE a RIFF/WAVE stream: walks the chunk list (odd
    * chunks padded to word boundaries per the RIFF spec; unknown chunks
    * like LIST/INFO skipped — real files carry them), requires `fmt `
    * before `data`, and accepts only what it can honestly decode
    * (PCM format 1, 16-bit). Anything malformed or unsupported throws
    * with a precise message.
    */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(isRiffWave(bytes), "WAV: not a RIFF/WAVE stream")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riffSize = buf.getInt(4)
    require(riffSize.toLong + 8 == bytes.length,
      s"WAV: RIFF size $riffSize + 8 != stream length ${bytes.length}")
    var pos = 12
    var rate = -1; var channels = -1; var blockAlign = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val len = buf.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len.toLong <= bytes.length,
        s"WAV: chunk '$id' length $len overruns the stream at byte $pos")
      id match {
        case "fmt " =>
          require(rate < 0, "WAV: duplicate fmt chunk")
          require(len >= 16, s"WAV: fmt chunk too short ($len bytes)")
          val fmt = buf.getShort(pos + 8)
          require(fmt == 1, s"WAV: unsupported audio format $fmt (PCM=1)")
          channels = buf.getShort(pos + 10)
          require(channels >= 1, s"WAV: $channels channels")
          rate = buf.getInt(pos + 12)
          require(rate > 0, s"WAV: sample rate $rate")
          val byteRate = buf.getInt(pos + 16)
          blockAlign = buf.getShort(pos + 20)
          val bits = buf.getShort(pos + 22)
          require(bits == 16, s"WAV: unsupported $bits bits per sample")
          require(blockAlign == channels * 2,
            s"WAV: blockAlign $blockAlign != channels*2 ${channels * 2}")
          require(byteRate == rate * blockAlign,
            s"WAV: byteRate $byteRate != rate*blockAlign " +
              s"${rate * blockAlign}")
        case "data" =>
          require(rate > 0, "WAV: data chunk before fmt chunk")
          require(samples == null, "WAV: duplicate data chunk")
          require(len % blockAlign == 0,
            s"WAV: data length $len not a multiple of blockAlign " +
              s"$blockAlign")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = buf.getShort(pos + 8 + i * 2)
            i += 1
          }
        case _ => () // unknown chunk (LIST, INFO, fact, ...): skip
      }
      pos += 8 + len + (len & 1) // RIFF pads odd chunks to even offsets
    }
    require(pos == bytes.length,
      s"WAV: trailing garbage after last chunk (at byte $pos of " +
        s"${bytes.length})")
    require(samples != null, "WAV: no data chunk")
    WavAudio(rate, channels, samples)
  }

  // ------------------------------------------------------------------
  // Y4M (YUV4MPEG2): validating header parse + O(1) frame seek.
  // ------------------------------------------------------------------

  /** A parsed Y4M stream handle: header fields plus the frame geometry
    * needed to seek any frame in O(1). `bytes` is the whole stream —
    * plane reads slice it lazily per sampled frame.
    */
  final case class Y4mStream(width: Int, height: Int, fpsNum: Int,
      fpsDen: Int, nFrames: Int, headerLen: Int, bytes: Array[Byte]) {
    /** bytes per frame: the `FRAME\n` marker + three full C444 planes */
    def frameBytes: Int = 6 + 3 * width * height
  }

  /** Parse + VALIDATE a YUV4MPEG2 header. Supports what it can honestly
    * decode: C444 (three full-resolution planes — declared or defaulted
    * here by our encoder; the spec default 420 is rejected loudly, not
    * silently mis-sliced) and bare `FRAME\n` markers (fixed-size frames,
    * the property that makes O(1) seek possible). Frame count derives
    * from the payload length, which must divide exactly.
    */
  def parseY4m(bytes: Array[Byte]): Y4mStream = {
    require(isY4m(bytes), "Y4M: not a YUV4MPEG2 stream")
    var eol = 9
    while (eol < bytes.length && bytes(eol) != '\n') eol += 1
    require(eol < bytes.length, "Y4M: unterminated stream header")
    val params = new String(bytes, 9, eol - 9,
      java.nio.charset.StandardCharsets.US_ASCII)
      .split(' ').filter(_.nonEmpty)
    var w = -1; var h = -1; var fn = 30; var fd = 1; var colour = "444"
    params.foreach { p =>
      p.charAt(0) match {
        case 'W' => w = p.tail.toInt
        case 'H' => h = p.tail.toInt
        case 'F' =>
          val Array(a, b) = p.tail.split(':'); fn = a.toInt; fd = b.toInt
        case 'C' => colour = p.tail
        case _ => () // I (interlace), A (aspect), X (extension): ignored
      }
    }
    require(w > 0 && h > 0, s"Y4M: missing or bad dimensions ${w}x$h")
    require(fn > 0 && fd > 0, s"Y4M: bad frame rate $fn:$fd")
    require(colour == "444",
      s"Y4M: unsupported colourspace C$colour (only C444 is decodable " +
        "here; a 420 stream would be silently mis-sliced)")
    // Long arithmetic: crafted header dims must not wrap Int and turn
    // the divisibility check into a false pass (the parser IS the
    // validation — same guard as the PPM decoder)
    val fbL = 6L + 3L * w * h
    require(fbL <= Int.MaxValue, s"Y4M: dimensions ${w}x$h overflow")
    val fb = fbL.toInt
    val headerLen = eol + 1
    val body = bytes.length - headerLen
    require(body % fb == 0,
      s"Y4M: body $body bytes not a multiple of frame size $fb")
    Y4mStream(w, h, fn, fd, body / fb, headerLen, bytes)
  }

  /** Sum each plane of frame `idx` — an O(1) SEEK into the stream (only
    * this frame's bytes are touched; that is the point of the fixed-size
    * container). The frame marker is validated at the seek target, so a
    * corrupt or variable-size stream fails loudly instead of returning
    * sums of the wrong bytes.
    */
  def y4mPlaneSums(s: Y4mStream, idx: Int): (Long, Long, Long) = {
    require(idx >= 0 && idx < s.nFrames,
      s"Y4M: frame $idx of ${s.nFrames}")
    val off = s.headerLen + idx.toLong * s.frameBytes
    val o = off.toInt
    require(s.bytes(o) == 'F' && s.bytes(o + 1) == 'R' &&
      s.bytes(o + 2) == 'A' && s.bytes(o + 3) == 'M' &&
      s.bytes(o + 4) == 'E' && s.bytes(o + 5) == '\n',
      s"Y4M: no FRAME marker at frame $idx (byte $o) — corrupt stream " +
        "or per-frame parameters (unsupported: they break fixed-size " +
        "seek)")
    val n = s.width * s.height
    var y = 0L; var u = 0L; var v = 0L
    var i = 0
    val base = o + 6
    while (i < n) {
      y += s.bytes(base + i) & 0xff
      u += s.bytes(base + n + i) & 0xff
      v += s.bytes(base + 2 * n + i) & 0xff
      i += 1
    }
    (y, u, v)
  }

  /** Per-pixel luma difference between frames `idx` and `idx+1` —
    * Σ|Y_{idx+1}(j) − Y_{idx}(j)| over the Y plane, the classic shot-
    * boundary / temporal-activity signal. Like [[y4mPlaneSums]] this
    * SEEKS: only the two frames' bytes are touched, so a detector
    * sliding over an hours-long stream reads each frame twice and
    * nothing else.
    */
  def y4mFrameDeltaY(s: Y4mStream, idx: Int): Long = {
    require(idx >= 0 && idx + 1 < s.nFrames,
      s"Y4M: delta needs frames $idx and ${idx + 1} of ${s.nFrames}")
    val n = s.width * s.height
    def yBase(i: Int): Int = {
      val o = s.headerLen + i * s.frameBytes
      require(s.bytes(o) == 'F' && s.bytes(o + 1) == 'R' &&
        s.bytes(o + 2) == 'A' && s.bytes(o + 3) == 'M' &&
        s.bytes(o + 4) == 'E' && s.bytes(o + 5) == '\n',
        s"Y4M: no FRAME marker at frame $i (byte $o)")
      o + 6
    }
    val a = yBase(idx)
    val b = yBase(idx + 1)
    var d = 0L
    var j = 0
    while (j < n) {
      d += math.abs((s.bytes(b + j) & 0xff) - (s.bytes(a + j) & 0xff))
      j += 1
    }
    d
  }

  /** Nearest-neighbor PCM resample — the rate canonicalization every
    * speech corpus needs before training (mixed 8/12/16/20 kHz feeds
    * to one model rate): out[t] = in[t * srcRate / dstRate] over
    * n_out = n_in * dstRate / srcRate samples, all integer index
    * arithmetic so the result is bit-reproducible cross-engine. NN is
    * the right baseline here for the same reason as the image side
    * ([[graft.multimodal.Multimodal.resizeNearest]]): a windowed-sinc
    * kernel is a float filter no SQL oracle can replay exactly,
    * whereas the index map is pure integer math.
    */
  def resampleNearest(samples: Array[Short], srcRate: Int,
      dstRate: Int): Array[Short] = {
    require(srcRate > 0 && dstRate > 0,
      s"resample: rates must be positive, got $srcRate -> $dstRate")
    val nOutL = samples.length.toLong * dstRate / srcRate
    require(nOutL <= Int.MaxValue,
      s"resample: output of $nOutL samples exceeds array range " +
        s"(${samples.length} @ $srcRate -> $dstRate)")
    val nOut = nOutL.toInt
    val out = new Array[Short](nOut)
    var t = 0
    while (t < nOut) {
      out(t) = samples((t.toLong * srcRate / dstRate).toInt)
      t += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // AVI / MJPEG: JPEG frames in a minimal RIFF-AVI container — the
  // COMPRESSED video leg. The container is hand-parsed with the same
  // validating RIFF discipline as the WAV parser; the per-frame codec
  // is the JDK's real JPEG (proven by q160/q163). Frame chunks are
  // indexed at parse time, so sampling k of n frames decodes k JPEGs
  // and touches no other frame's bytes — the compressed-stream
  // analogue of the Y4M fixed-size seek.
  // ------------------------------------------------------------------

  def isRiffAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' &&
      b(11) == ' '

  /** A parsed MJPEG-AVI handle: header geometry plus every video
    * chunk's (payload offset, length) collected in one container walk.
    * `frameJpeg(i)` slices ONLY frame i's bytes.
    */
  final case class AviMjpegStream(width: Int, height: Int, fps: Int,
      nFrames: Int, frameOffsets: Array[Int], frameLengths: Array[Int],
      bytes: Array[Byte]) {
    /** Frame `i`'s JPEG stream — a slice of the container, validated
      * to start with an SOI marker so a mis-indexed chunk fails loudly.
      */
    def frameJpeg(i: Int): Array[Byte] = {
      require(i >= 0 && i < nFrames, s"AVI: frame $i of $nFrames")
      val out = java.util.Arrays.copyOfRange(bytes, frameOffsets(i),
        frameOffsets(i) + frameLengths(i))
      require(isJpeg(out),
        s"AVI: frame chunk $i does not start with a JPEG SOI marker")
      out
    }
  }

  /** Mux JPEG streams into a minimal standard AVI: RIFF('AVI '
    * LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' '00dc'*)
    * idx1), one 'vids'/'MJPG' stream, odd chunks padded per RIFF.
    * idx1 offsets follow the common convention: relative to the
    * 'movi' fourcc (first chunk at offset 4).
    */
  def encodeAviMjpeg(w: Int, h: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0, s"AVI encode: bad dimensions ${w}x$h")
    require(fps > 0, s"AVI encode: bad fps $fps")
    require(frames.nonEmpty, "AVI encode: no frames")
    frames.foreach(f =>
      require(isJpeg(f), "AVI encode: frame is not a JPEG stream"))
    val strlLen = 4 + (8 + 56) + (8 + 40)
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen)
    val moviLen = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val idx1Len = 16 * frames.length
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen) + (8 + idx1Len)
    val buf = ByteBuffer.allocate(8 + riffLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = { buf.put(s.getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)); () }
    fourcc("RIFF"); buf.putInt(riffLen); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(0).putInt(0) // maxBytesPerSec, paddingGranularity
      .putInt(0x10) // AVIF_HASINDEX
      .putInt(frames.length) // dwTotalFrames
      .putInt(0).putInt(1).putInt(0) // initialFrames, streams, bufSize
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    fourcc("LIST"); buf.putInt(strlLen); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    buf.putInt(0) // flags
      .putShort(0).putShort(0) // priority, language
      .putInt(0) // initialFrames
      .putInt(1).putInt(fps) // scale, rate -> fps frames/sec
      .putInt(0).putInt(frames.length) // start, length
      .putInt(0).putInt(-1).putInt(0) // bufSize, quality, sampleSize
      .putShort(0).putShort(0) // rcFrame left, top
      .putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h) // biSize, biWidth, biHeight
      .putShort(1).putShort(24) // biPlanes, biBitCount
    fourcc("MJPG") // biCompression
    buf.putInt(w * h * 3) // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val moviFcc = buf.position() + 8 // position of the 'movi' fourcc
    fourcc("LIST"); buf.putInt(moviLen); fourcc("movi")
    val offs = new Array[Int](frames.length)
    frames.zipWithIndex.foreach { case (f, i) =>
      offs(i) = buf.position() - moviFcc
      fourcc("00dc"); buf.putInt(f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    fourcc("idx1"); buf.putInt(idx1Len)
    frames.zipWithIndex.foreach { case (f, i) =>
      fourcc("00dc")
      buf.putInt(0x10).putInt(offs(i)).putInt(f.length) // AVIIF_KEYFRAME
    }
    buf.array()
  }

  /** Parse + VALIDATE a single-stream MJPEG AVI: RIFF form check,
    * chunk walk with pad bytes, avih/strh/strf cross-checks (one
    * 'vids' stream, 'MJPG' handler AND biCompression, dims agree,
    * frame counts agree), movi '00dc' chunk collection, and an idx1
    * cross-check when present (entry count, per-entry offset/length
    * against the walked chunks). Unknown chunks/LISTs skip; anything
    * structurally wrong throws with a precise message.
    */
  def parseAviMjpeg(bytes: Array[Byte]): AviMjpegStream = {
    require(isRiffAvi(bytes), "AVI: not a RIFF/AVI stream")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riffSize = buf.getInt(4)
    require(riffSize.toLong + 8 == bytes.length,
      s"AVI: RIFF size $riffSize + 8 != stream length ${bytes.length}")
    def fccAt(p: Int): String = new String(bytes, p, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    var w = -1; var h = -1; var totalFrames = -1; var fps = -1
    var strhFrames = -1; var sawStrf = false
    var moviFcc = -1
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val lens = scala.collection.mutable.ArrayBuffer.empty[Int]
    var idx1Checked = false

    def walkHdrl(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fccAt(p); val len = buf.getInt(p + 4)
        require(len >= 0 && p + 8 + len.toLong <= end,
          s"AVI: hdrl chunk '$id' length $len overruns at byte $p")
        id match {
          case "avih" =>
            require(len >= 56, s"AVI: avih chunk too short ($len)")
            require(w < 0, "AVI: duplicate avih chunk")
            totalFrames = buf.getInt(p + 8 + 16)
            val streams = buf.getInt(p + 8 + 24)
            require(streams == 1,
              s"AVI: $streams streams (only single-stream MJPEG here)")
            w = buf.getInt(p + 8 + 32); h = buf.getInt(p + 8 + 36)
            require(w > 0 && h > 0, s"AVI: bad dimensions ${w}x$h")
          case "LIST" =>
            // length check BEFORE reading the list-type fourcc: the
            // overrun require above only bounds p+8+len, so a crafted
            // len in 0..3 would otherwise read past the chunk (and
            // possibly the stream) — same guard as the top-level walk
            require(len >= 4, s"AVI: hdrl LIST chunk too short ($len)")
            if (fccAt(p + 8) == "strl") walkStrl(p + 12, p + 8 + len)
          case _ => ()
        }
        p += 8 + len + (len & 1)
      }
    }
    def walkStrl(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fccAt(p); val len = buf.getInt(p + 4)
        require(len >= 0 && p + 8 + len.toLong <= end,
          s"AVI: strl chunk '$id' length $len overruns at byte $p")
        id match {
          case "strh" =>
            require(len >= 56, s"AVI: strh chunk too short ($len)")
            val fccType = fccAt(p + 8)
            require(fccType == "vids",
              s"AVI: stream type '$fccType' (need 'vids')")
            val handler = fccAt(p + 12)
            require(handler == "MJPG",
              s"AVI: codec handler '$handler' (only MJPG is decodable " +
                "here; any other handler would be silently garbage)")
            val scale = buf.getInt(p + 8 + 20)
            val rate = buf.getInt(p + 8 + 24)
            require(scale > 0 && rate > 0,
              s"AVI: bad strh rate $rate/$scale")
            fps = rate / scale
            strhFrames = buf.getInt(p + 8 + 32)
          case "strf" =>
            require(len >= 40, s"AVI: strf chunk too short ($len)")
            val comp = fccAt(p + 8 + 16)
            require(comp == "MJPG",
              s"AVI: biCompression '$comp' != strh handler MJPG")
            val bw = buf.getInt(p + 8 + 4)
            val bh = buf.getInt(p + 8 + 8)
            require(bw == w && math.abs(bh) == h,
              s"AVI: strf dims ${bw}x$bh disagree with avih ${w}x$h")
            sawStrf = true
          case _ => ()
        }
        p += 8 + len + (len & 1)
      }
    }
    def walkMovi(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fccAt(p); val len = buf.getInt(p + 4)
        require(len >= 0 && p + 8 + len.toLong <= end,
          s"AVI: movi chunk '$id' length $len overruns at byte $p")
        if (id == "00dc") { offs += p + 8; lens += len }
        p += 8 + len + (len & 1)
      }
    }

    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = fccAt(pos); val len = buf.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len.toLong <= bytes.length,
        s"AVI: chunk '$id' length $len overruns the stream at byte $pos")
      id match {
        case "LIST" =>
          require(len >= 4, s"AVI: LIST chunk too short ($len)")
          fccAt(pos + 8) match {
            case "hdrl" => walkHdrl(pos + 12, pos + 8 + len)
            case "movi" =>
              require(moviFcc < 0, "AVI: duplicate movi list")
              moviFcc = pos + 8
              walkMovi(pos + 12, pos + 8 + len)
            case _ => () // INFO etc.: skip
          }
        case "idx1" =>
          require(moviFcc >= 0, "AVI: idx1 before movi list")
          require(len % 16 == 0, s"AVI: idx1 length $len not 16-aligned")
          val n = len / 16
          require(n == offs.length,
            s"AVI: idx1 has $n entries, movi has ${offs.length} chunks")
          var i = 0
          while (i < n) {
            val e = pos + 8 + i * 16
            require(fccAt(e) == "00dc",
              s"AVI: idx1 entry $i id '${fccAt(e)}'")
            val off = buf.getInt(e + 8); val elen = buf.getInt(e + 12)
            require(moviFcc + off + 8 == offs(i) && elen == lens(i),
              s"AVI: idx1 entry $i (off $off, len $elen) disagrees " +
                s"with walked chunk (payload at ${offs(i)}, ${lens(i)})")
            i += 1
          }
          idx1Checked = true
        case _ => () // JUNK etc.: skip
      }
      pos += 8 + len + (len & 1)
    }
    require(pos == bytes.length,
      s"AVI: trailing garbage after last chunk (at byte $pos of " +
        s"${bytes.length})")
    require(w > 0, "AVI: no avih header")
    require(fps > 0, "AVI: no strh stream header")
    require(sawStrf, "AVI: no strf stream format")
    require(moviFcc >= 0, "AVI: no movi list")
    require(idx1Checked, "AVI: no idx1 index (AVIF_HASINDEX declared)")
    require(offs.length == totalFrames && totalFrames == strhFrames,
      s"AVI: frame counts disagree (avih $totalFrames, strh " +
        s"$strhFrames, movi ${offs.length})")
    AviMjpegStream(w, h, fps, offs.length, offs.toArray, lens.toArray,
      bytes)
  }

  /** Encode C444 frames (each `w*h*3` plane-ordered bytes: Y then U
    * then V) as a canonical YUV4MPEG2 stream with bare frame markers.
    */
  def encodeY4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    frames.foreach(f => require(f.length == 3 * w * h,
      s"Y4M encode: frame has ${f.length} bytes, need ${3 * w * h}"))
    val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C444\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    val out = ByteBuffer.allocate(
      header.length + frames.map(_.length + 6).sum)
    out.put(header)
    frames.foreach { f => out.put(marker); out.put(f) }
    out.array()
  }
}
