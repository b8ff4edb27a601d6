package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

import Multimodal.PpmImage

/** An INDEPENDENT reference PNG decoder for the property spec — a
  * from-scratch implementation of the PNG spec's container (chunk walk
  * with CRC-32 verification), zlib inflate (the JDK's raw Inflater, a
  * different entry point from ImageIO's decode path), and all five
  * scanline filters (None/Sub/Up/Average/Paeth), for the profile the
  * engine synthesizes: 8-bit truecolor (color type 2), non-interlaced.
  * If `Codecs.decodePng` (ImageIO) and this decoder agree byte-for-byte
  * on every pixel, a silent decode bug would have to exist identically
  * in two unrelated implementations.
  *
  * Test-tree only: the product path is the JDK codec; this exists to
  * check it.
  */
object PngRefDecoder {
  def decode(bytes: Array[Byte]): PpmImage = {
    require(Codecs.isPng(bytes), "PngRef: bad signature")
    var pos = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    while (!sawEnd) {
      require(pos + 8 <= bytes.length, "PngRef: truncated chunk header")
      val len = be32(pos)
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12 + len.toLong <= bytes.length,
        s"PngRef: chunk $typ length $len overruns stream")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == be32(pos + 8 + len),
        s"PngRef: CRC mismatch on chunk $typ")
      typ match {
        case "IHDR" =>
          require(len == 13, s"PngRef: IHDR length $len")
          w = be32(pos + 8); h = be32(pos + 12)
          val bitDepth = bytes(pos + 16)
          val colorType = bytes(pos + 17)
          val interlace = bytes(pos + 20)
          require(bitDepth == 8 && colorType == 2 && interlace == 0,
            s"PngRef: unsupported profile depth=$bitDepth color=$colorType"
              + s" interlace=$interlace (reference covers 8-bit RGB only)")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...): skip
      }
      pos += 12 + len
    }
    require(w > 0 && h > 0, "PngRef: no IHDR before IDAT/IEND")
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      // n == 0 while unfinished means the stream is truncated OR wants
      // input this decoder cannot supply (e.g. an FDICT preset
      // dictionary) — both are rejections, never a spin
      require(n > 0 || inf.finished(), "PngRef: inflate stalled " +
        "(truncated or dictionary-demanding IDAT)")
      off += n
    }
    require(off == raw.length,
      s"PngRef: inflated $off bytes, expected ${raw.length}")
    inf.end()
    // defilter in place into the output
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= 3) out(rowOut + x - 3) & 0xff else 0
        val above = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val upLeft =
          if (y > 0 && x >= 3) out(rowOut - stride + x - 3) & 0xff else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + above
          case 3 => cur + (left + above) / 2
          case 4 =>
            val p = left + above - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - above)
            val pc = math.abs(p - upLeft)
            val pred =
              if (pa <= pb && pa <= pc) left
              else if (pb <= pc) above
              else upLeft
            cur + pred
          case other =>
            throw new IllegalArgumentException(s"PngRef: filter $other")
        }
        out(rowOut + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, out)
  }

  /** Hand-build a minimal PNG with ONE chosen filter type applied to
    * every scanline — the test's lever for exercising each of the five
    * defilter paths in BOTH decoders regardless of what filters the JDK
    * encoder happens to choose.
    */
  def encodeWithFilter(img: PpmImage, filter: Int): Array[Byte] = {
    require(filter >= 0 && filter <= 4, s"filter $filter")
    val stride = img.width * 3
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      raw(y * (stride + 1)) = filter.toByte
      var x = 0
      while (x < stride) {
        val cur = img.pixels(y * stride + x) & 0xff
        val left = if (x >= 3) img.pixels(y * stride + x - 3) & 0xff else 0
        val above = if (y > 0) img.pixels((y - 1) * stride + x) & 0xff else 0
        val upLeft =
          if (y > 0 && x >= 3) img.pixels((y - 1) * stride + x - 3) & 0xff
          else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - above
          case 3 => cur - (left + above) / 2
          case 4 =>
            val p = left + above - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - above)
            val pc = math.abs(p - upLeft)
            val pred =
              if (pa <= pb && pa <= pc) left
              else if (pb <= pc) above
              else upLeft
            cur - pred
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater()
    defl.setInput(raw)
    defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a,
      0x0a))
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val t = typ.getBytes("US-ASCII")
      out.write(t)
      out.write(data)
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(img.width) ++ be32(img.height) ++
      Array[Byte](8, 2, 0, 0, 0))
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
