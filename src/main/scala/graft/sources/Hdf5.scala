package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** A REAL (minimal) HDF5 codec, pure JVM — retires the last
  * env-blocked adjudication the same way the r14 media codecs did:
  * the reference ingests VPIC dumps through `pyvpic.open` over HDF5
  * (/root/reference/src/datasets/vpicdataset.py:9,194), and with no
  * HDF5 library in this environment the tree had been mocked with
  * raw `data.bin` files. This module writes and validates a
  * well-defined subset of the PUBLIC HDF5 File Format Specification
  * (version 0 superblock — the format every HDF5 1.x library reads):
  *
  *   - superblock v0, 8-byte offsets/lengths;
  *   - groups as the classic symbol-table machinery: a v1 B-tree
  *     (node type 0) of ANY depth over SNOD symbol-table nodes with
  *     names in a local heap — wide groups (real dumps put dozens of
  *     variables in one group) split across SNODs and spill into
  *     internal B-tree levels; nodes are written at their FULL
  *     allocated size (2·K entry slots, zero-filled) so a library
  *     that reads whole allocated nodes never lands past
  *     end-of-allocation;
  *   - datasets as v1 object headers carrying the messages an array
  *     needs — Dataspace (v1, simple), Datatype (class 1
  *     floating-point, IEEE binary32 OR binary64, either byte
  *     order), Data Layout (v3, class 1 contiguous or class 2
  *     CHUNKED), and for chunked data the optional Filter Pipeline
  *     (v1, deflate) — real h5py/VPIC dumps are typically chunked
  *     f32 with gzip, which is exactly this corner;
  *   - chunked raw data behind a v1 B-tree of node type 1 (ANY
  *     depth on read; the writer emits multi-level trees past 2·K
  *     chunks per node), each chunk individually deflated so a
  *     reader decompresses ONLY the chunks it touches;
  *   - object header CONTINUATION blocks (libhdf5 overflows headers
  *     into them routinely — filters, fill values, attributes): the
  *     reader chains them cycle-guarded, and the writer spills past
  *     three messages so every chunked+gzip dataset exercises the
  *     path.
  *
  * Everything OUTSIDE the subset — later superblock versions,
  * compact layouts, non-float types, filters other than deflate,
  * unallocated chunks — is rejected LOUDLY with a precise message,
  * never silently mis-read (the WAV/AVI parser discipline).
  *
  * The parser builds a metadata INDEX ONLY (paths, dims, data/chunk
  * addresses) by seeking through header structures; dataset bytes
  * are never materialized here — the DSv2 partition reader seeks
  * straight into its own contiguous block slice or its own chunks
  * and decompresses per chunk, which is the 100 TB ingest story
  * ([[VPICSource]]).
  */
object Hdf5 {
  private val Signature: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, 0x0a)
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF: the undefined address
  private val LeafK = 4 // symbols per SNOD = 2 * LeafK
  /** Chunk B-tree K. Superblock v0 carries no indexed-storage K field;
    * libhdf5's default for v0 files is 32, so nodes hold up to 64
    * chunk entries and are allocated at that size.
    */
  private val IstoreK = 32

  /** Physical layout of one dataset's raw data. */
  sealed trait H5Layout
  /** One uncompressed block at `dataAddress`. */
  final case class H5Contiguous(dataAddress: Long) extends H5Layout
  /** Chunked storage: `chunkDims` are the SPATIAL chunk dims (same
    * rank as the dataset; the on-disk key/layout carry a trailing
    * element-size dim which is validated and dropped here), `gzip`
    * says each chunk is a deflate stream, `shuffle` that the bytes
    * were byte-transposed before deflate (the standard h5py
    * `shuffle=True, compression='gzip'` combination), and `chunks`
    * is the full chunk index in offset order — metadata only (one
    * entry per chunk, no data).
    */
  final case class H5Chunked(chunkDims: Array[Long], gzip: Boolean,
      shuffle: Boolean, chunks: Seq[H5Chunk]) extends H5Layout
  /** One chunk: its dataset-space offset (rank values), its file
    * address, and its STORED byte count (compressed size under gzip).
    */
  final case class H5Chunk(offset: Array[Long], addr: Long,
      storedBytes: Long)

  /** One dataset in the index: slash-joined path, dimension sizes,
    * byte order, element size (4 = binary32, 8 = binary64) and layout.
    */
  final case class H5Dataset(path: String, dims: Array[Long],
      littleEndian: Boolean, elemSize: Int, layout: H5Layout) {
    def nElems: Long = dims.product
    /** The contiguous block address — only meaningful for
      * [[H5Contiguous]] datasets; callers on the chunked path go
      * through the chunk index instead.
      */
    def dataAddress: Long = layout match {
      case H5Contiguous(a) => a
      case _: H5Chunked => throw new IllegalStateException(
        s"HDF5: $path is chunked; it has no single data address")
    }
  }

  /** Writer-side description of one dataset. `chunkDims = None` is
    * the contiguous layout; `Some(dims)` chunks the data (required
    * for `gzip`/`shuffle` — HDF5 filters apply to chunked layouts
    * only). `shuffle` byte-transposes each chunk before deflate
    * (h5py's default companion to gzip — same-significance bytes
    * land adjacent, which is what makes float data compress).
    * `f32` stores IEEE binary32 (values are narrowed; the reader
    * widens back to doubles).
    */
  final case class H5Write(path: String, dims: Array[Long],
      data: Array[Double], chunkDims: Option[Array[Long]] = None,
      gzip: Boolean = false, f32: Boolean = false,
      shuffle: Boolean = false)

  // ------------------------------------------------------------------
  // Writer
  // ------------------------------------------------------------------

  private final class Buf {
    private var arr = new Array[Byte](1 << 16)
    private var len = 0
    def pos: Long = len.toLong
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        var cap = arr.length
        while (cap < len + n) cap <<= 1
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def bytes(b: Array[Byte]): Long =
      { val at = pos; ensure(b.length); System.arraycopy(b, 0, arr, len, b.length); len += b.length; at }
    def u8(v: Int): Long = bytes(Array(v.toByte))
    def u16(v: Int): Long =
      bytes(Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
    def u32(v: Long): Long = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt((v & 0xffffffffL).toInt); bytes(b.array())
    }
    def u64(v: Long): Long = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(v); bytes(b.array())
    }
    def pad8(): Unit = while (len % 8 != 0) u8(0)
    def zeroTo(at: Long): Unit = { require(at >= pos); while (pos < at) u8(0) }
    def patchU64(at: Long, v: Long): Unit = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(v)
      System.arraycopy(b.array(), 0, arr, at.toInt, 8)
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  private sealed trait Node
  private final case class DsNode(spec: H5Write) extends Node
  private final case class GrpNode(
      children: scala.collection.mutable.LinkedHashMap[String, Node])
    extends Node

  /** Deflate `b` (zlib stream — the HDF5 deflate filter's format). */
  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
      val tmp = new Array[Byte](8192)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      out.toByteArray
    } finally d.end()
  }

  /** Inflate a stored chunk to exactly `expect` bytes, rejecting
    * truncated or oversize streams loudly.
    */
  def inflate(b: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b)
      val out = new Array[Byte](expect)
      var off = 0
      var stalled = false
      while (off < expect && !inf.finished() && !stalled) {
        val k =
          try inf.inflate(out, off, expect - off)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"HDF5: corrupt deflate stream in chunk (${e.getMessage})")
          }
        // needsDictionary: a zlib header with FDICT set makes inflate
        // return 0 with needsInput()==false forever — treat as stalled
        // (loud reject below), never spin
        if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
          stalled = true
        off += k
      }
      require(off == expect,
        s"HDF5: chunk inflated to $off bytes, expected $expect " +
          "(truncated or corrupt deflate stream)")
      require(inf.finished() || inf.inflate(new Array[Byte](1)) == 0,
        "HDF5: deflate stream longer than the declared chunk")
      out
    } finally inf.end()
  }

  /** The HDF5 shuffle filter (id 2): byte-transpose so every
    * element's k-th byte lands in the k-th plane — what makes float
    * chunks deflate. `b.length` must be a multiple of `elemSize`.
    */
  private def shuffleBytes(b: Array[Byte], elemSize: Int): Array[Byte] = {
    val n = b.length / elemSize
    val out = new Array[Byte](b.length)
    var i = 0
    while (i < n) {
      var k = 0
      while (k < elemSize) {
        out(k * n + i) = b(i * elemSize + k)
        k += 1
      }
      i += 1
    }
    out
  }

  private def unshuffleBytes(b: Array[Byte], elemSize: Int): Array[Byte] = {
    val n = b.length / elemSize
    val out = new Array[Byte](b.length)
    var i = 0
    while (i < n) {
      var k = 0
      while (k < elemSize) {
        out(i * elemSize + k) = b(k * n + i)
        k += 1
      }
      i += 1
    }
    out
  }

  /** Decode one STORED chunk back to raw element bytes: inverse
    * filters in reverse pipeline order (inflate, then un-shuffle).
    * Shared by the driver-side reads and the DSv2 chunk partition
    * reader — one copy of the filter semantics.
    */
  def decodeChunk(stored: Array[Byte], expectBytes: Int, gzip: Boolean,
      shuffle: Boolean, elemSize: Int): Array[Byte] = {
    val inflated = if (gzip) inflate(stored, expectBytes) else {
      require(stored.length == expectBytes,
        s"HDF5: unfiltered chunk stores ${stored.length} bytes, " +
          s"expected $expectBytes")
      stored
    }
    if (shuffle) unshuffleBytes(inflated, elemSize) else inflated
  }

  /** Legacy entry point: contiguous f64 datasets (slash-joined path ->
    * (dims, row-major values)).
    */
  def write(path: String,
      datasets: Seq[(String, Array[Long], Array[Double])],
      littleEndian: Boolean = false): Unit =
    writeSpecs(path, datasets.map { case (p, dims, data) =>
      H5Write(p, dims, data)
    }, littleEndian)

  /** Write `datasets` as a real HDF5 file. Intermediate groups are
    * created; link order within a group is name-sorted (the B-tree
    * contract); chunked datasets get a node-type-1 chunk B-tree and,
    * under `gzip`, per-chunk deflate streams.
    */
  def writeSpecs(path: String, datasets: Seq[H5Write],
      littleEndian: Boolean = false): Unit = {
    datasets.foreach { d =>
      require(d.dims.forall(_ > 0), s"HDF5 write: bad dims for ${d.path}")
      require(d.dims.product == d.data.length,
        s"HDF5 write: ${d.path} dims ${d.dims.mkString("x")} != " +
          s"${d.data.length} values")
      d.chunkDims.foreach { cd =>
        require(cd.length == d.dims.length,
          s"HDF5 write: ${d.path} chunk rank ${cd.length} != ${d.dims.length}")
        require(cd.forall(_ > 0), s"HDF5 write: bad chunk dims for ${d.path}")
        require(cd.zip(d.dims).forall { case (c, n) => c <= n },
          s"HDF5 write: ${d.path} chunk ${cd.mkString("x")} exceeds " +
            s"dims ${d.dims.mkString("x")}")
      }
      require((!d.gzip && !d.shuffle) || d.chunkDims.isDefined,
        s"HDF5 write: ${d.path} gzip/shuffle requires a chunked layout " +
          "(HDF5 filters apply to chunks)")
    }
    val root = GrpNode(scala.collection.mutable.LinkedHashMap.empty)
    datasets.foreach { d =>
      val parts = d.path.split('/').filter(_.nonEmpty)
      require(parts.nonEmpty, "HDF5 write: empty dataset path")
      var g = root
      parts.dropRight(1).foreach { seg =>
        g = g.children.getOrElseUpdate(seg,
          GrpNode(scala.collection.mutable.LinkedHashMap.empty)) match {
          case grp: GrpNode => grp
          case _: DsNode => throw new IllegalArgumentException(
            s"HDF5 write: $seg is both a dataset and a group on path ${d.path}")
        }
      }
      require(!g.children.contains(parts.last),
        s"HDF5 write: duplicate path ${d.path}")
      g.children(parts.last) = DsNode(d)
    }

    val buf = new Buf
    val order = if (littleEndian) ByteOrder.LITTLE_ENDIAN
                else ByteOrder.BIG_ENDIAN
    // ---- superblock v0 (96 bytes; EOF + root entry patched at the end)
    buf.bytes(Signature)
    buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0) // versions + reserved
    buf.u8(0) // shared header message version
    buf.u8(8); buf.u8(8); buf.u8(0) // sizeof offsets, lengths, reserved
    buf.u16(LeafK); buf.u16(16) // group leaf / internal node K
    buf.u32(0) // file consistency flags
    buf.u64(0) // base address
    buf.u64(Undef) // free-space info address
    val eofAt = buf.u64(0) // end-of-file address (patched)
    buf.u64(Undef) // driver info block
    // root symbol table entry (40 bytes; addresses patched)
    val rootLinkAt = buf.u64(0)
    val rootOhAt = buf.u64(0)
    buf.u32(1); buf.u32(0) // cache type 1 (group), reserved
    val rootBtAt = buf.u64(0)
    val rootHeapAt = buf.u64(0)
    require(rootLinkAt == 56, "HDF5 write: superblock layout drifted")

    def pad8len(n: Int): Int = (n + 7) & ~7

    def serialize(spec: H5Write, vals: Array[Double]): Array[Byte] = {
      val es = if (spec.f32) 4 else 8
      val bb = ByteBuffer.allocate(vals.length * es).order(order)
      if (spec.f32) vals.foreach(v => bb.putFloat(v.toFloat))
      else vals.foreach(bb.putDouble)
      bb.array()
    }

    /** Raw-data chunk B-tree key: stored size, filter mask 0, then
      * rank+1 offsets (the trailing one — the element-size dim — is 0).
      */
    def chunkKey(storedBytes: Long, offsets: Array[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + 8 * (offsets.length + 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(storedBytes.toInt); b.putInt(0)
      offsets.foreach(b.putLong); b.putLong(0L)
      b.array()
    }

    /** Write a node-type-1 B-tree over `addrs` chunks with boundary
      * keys `keys` (addrs.length + 1 of them: each chunk's key plus
      * the past-the-end key). Builds as many levels as the 2·K node
      * capacity requires; every node is zero-padded to its full
      * allocated size and siblings are wired. Returns the root addr.
      */
    def writeChunkBtree(keys: IndexedSeq[Array[Byte]],
        addrs: IndexedSeq[Long]): Long = {
      val keySize = keys.head.length
      val cap = 2 * IstoreK
      val alloc = 24L + cap * 8 + (cap + 1) * keySize
      def level(lvl: Int, ks: IndexedSeq[Array[Byte]],
          children: IndexedSeq[Long]): Long = {
        val groups = children.indices.grouped(cap).toIndexedSeq
        val nodeAddrs = new Array[Long](groups.length)
        groups.zipWithIndex.foreach { case (g, gi) =>
          buf.pad8()
          val at = buf.pos
          nodeAddrs(gi) = at
          buf.bytes("TREE".getBytes(US_ASCII))
          buf.u8(1); buf.u8(lvl) // node type 1 (raw data), level
          buf.u16(g.length)
          buf.u64(if (gi == 0) Undef else nodeAddrs(gi - 1))
          buf.u64(Undef) // right sibling, patched when the next lands
          g.foreach { i => buf.bytes(ks(i)); buf.u64(children(i)) }
          buf.bytes(ks(g.last + 1))
          buf.zeroTo(at + alloc)
          if (gi > 0) buf.patchU64(nodeAddrs(gi - 1) + 16, at)
        }
        if (groups.length == 1) nodeAddrs(0)
        else level(lvl + 1,
          groups.map(g => ks(g.head)) :+ ks.last,
          scala.collection.immutable.ArraySeq.unsafeWrapArray(nodeAddrs))
      }
      level(0, keys, addrs)
    }

    def writeDatasetOh(spec: H5Write): Long = {
      val rank = spec.dims.length
      val es = if (spec.f32) 4 else 8
      // raw data first (the layout message needs its address)
      val layout: Array[Byte] = spec.chunkDims match {
        case None =>
          buf.pad8()
          val dataAddr = buf.pos
          buf.bytes(serialize(spec, spec.data))
          val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
          b.put(3.toByte).put(1.toByte) // version 3, class 1 contiguous
          b.putLong(dataAddr).putLong(spec.data.length.toLong * es)
          b.array()
        case Some(cd) =>
          // chunk grid in row-major offset order — the increasing-key
          // contract of the B-tree
          val grid = spec.dims.zip(cd).map { case (n, c) =>
            ((n + c - 1) / c).toInt
          }
          val chunkElems = cd.product.toInt
          val strides = new Array[Long](rank)
          strides(rank - 1) = 1
          (rank - 2 to 0 by -1).foreach(d =>
            strides(d) = strides(d + 1) * spec.dims(d + 1))
          val coords = new Array[Int](rank)
          val nChunks = grid.product
          val keys = new Array[Array[Byte]](nChunks + 1)
          val addrs = new Array[Long](nChunks)
          (0 until nChunks).foreach { ci =>
            val off = coords.zip(cd).map { case (g, c) => g * c }
            // gather the FULL chunk (0.0 fill past the dataset edge)
            val vals = new Array[Double](chunkElems)
            val local = new Array[Int](rank)
            (0 until chunkElems).foreach { li =>
              var inBounds = true
              var lin = 0L
              var d = 0
              while (d < rank) {
                val g = off(d) + local(d)
                if (g >= spec.dims(d)) inBounds = false
                lin += g * strides(d)
                d += 1
              }
              if (inBounds) vals(li) = spec.data(lin.toInt)
              var k = rank - 1
              while (k >= 0) {
                local(k) += 1
                if (local(k) < cd(k)) k = -1
                else { local(k) = 0; k -= 1 }
              }
            }
            val raw = serialize(spec, vals)
            val shuffled =
              if (spec.shuffle) shuffleBytes(raw, es) else raw
            val stored = if (spec.gzip) deflate(shuffled) else shuffled
            buf.pad8()
            addrs(ci) = buf.bytes(stored)
            keys(ci) = chunkKey(stored.length.toLong, off)
            var k = rank - 1
            while (k >= 0) {
              coords(k) += 1
              if (coords(k) < grid(k)) k = -1
              else { coords(k) = 0; k -= 1 }
            }
          }
          // past-the-end boundary key: the chunk-grid edge offsets
          keys(nChunks) = chunkKey(0L,
            grid.zip(cd).map { case (g, c) => g.toLong * c })
          val btAddr = writeChunkBtree(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(keys),
            scala.collection.immutable.ArraySeq.unsafeWrapArray(addrs))
          val b = ByteBuffer.allocate(pad8len(2 + 1 + 8 + 4 * (rank + 1)))
            .order(ByteOrder.LITTLE_ENDIAN)
          b.put(3.toByte).put(2.toByte) // version 3, class 2 chunked
          b.put((rank + 1).toByte) // dimensionality incl. elem-size dim
          b.putLong(btAddr)
          cd.foreach(c => b.putInt(c.toInt))
          b.putInt(es)
          b.array()
      }
      buf.pad8()
      val ohAddr = buf.pos
      // message bodies, 8-byte aligned
      val dspace = {
        val b = ByteBuffer.allocate(8 + spec.dims.length * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte).put(spec.dims.length.toByte)
          .put(0.toByte) // flags: no max dims
          .put(Array[Byte](0, 0, 0, 0, 0)) // reserved
        spec.dims.foreach(b.putLong)
        b.array()
      }
      val dtype = {
        val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
        b.put(0x11.toByte) // version 1, class 1 (floating point)
        // class bit field: bit0 byte order, bits4-5 mantissa norm = 2
        b.put((0x20 | (if (littleEndian) 0 else 1)).toByte)
        if (spec.f32) {
          b.put(31.toByte).put(0.toByte) // sign location, reserved
          b.putInt(4) // size
          b.putShort(0).putShort(32) // bit offset, precision
          b.put(23.toByte).put(8.toByte) // exponent location, size
          b.put(0.toByte).put(23.toByte) // mantissa location, size
          b.putInt(127) // exponent bias
        } else {
          b.put(63.toByte).put(0.toByte) // sign location, reserved
          b.putInt(8) // size
          b.putShort(0).putShort(64) // bit offset, precision
          b.put(52.toByte).put(11.toByte) // exponent location, size
          b.put(0.toByte).put(52.toByte) // mantissa location, size
          b.putInt(1023) // exponent bias
        }
        b.array() // 24 bytes (20 used + 4 implicit pad within alloc)
      }
      val msgs = scala.collection.mutable.ArrayBuffer(
        (0x0001, dspace), (0x0003, dtype), (0x0008, layout))
      if (spec.gzip || spec.shuffle) msgs += ((0x000B, {
        // filters in APPLICATION order: shuffle (byte-transpose,
        // client value = element size) then deflate
        val fs = Seq(
          if (spec.shuffle) Some((2, "shuffle", es)) else None,
          if (spec.gzip) Some((1, "deflate", 6)) else None).flatten
        val b = ByteBuffer.allocate(8 + 24 * fs.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte).put(fs.length.toByte) // version 1, n filters
        b.putShort(0).putInt(0) // reserved
        fs.foreach { case (id, name, cval) =>
          b.putShort(id.toShort)
          b.putShort(8) // name length (8-padded)
          b.putShort(0) // flags
          b.putShort(1) // one client data value
          b.put(name.getBytes(US_ASCII)).put(0.toByte)
          b.putInt(cval) // client data
          b.putInt(0) // pad (odd client-value count)
        }
        b.array()
      }))
      writeOh(ohAddr, msgs.toSeq)
      ohAddr
    }

    def writeMsg(tpe: Int, body: Array[Byte]): Unit = {
      buf.u16(tpe); buf.u16(pad8len(body.length))
      buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0) // flags + reserved
      buf.bytes(body)
      buf.pad8()
    }

    /** v1 object header. Past three messages the remainder spills
      * into an OBJECT HEADER CONTINUATION block (message 0x0010 —
      * offset + length patched once the block lands), which is
      * exactly what libhdf5 does when a header overflows: every
      * chunked+gzip dataset here (4 messages) therefore exercises
      * the continuation path end to end.
      */
    def writeOh(at: Long, msgs: Seq[(Int, Array[Byte])]): Unit = {
      require(buf.pos == at)
      val (first, rest) =
        if (msgs.length > 3) msgs.splitAt(3) else (msgs, Nil)
      val contMsgSize = if (rest.isEmpty) 0 else 8 + 16
      val bodySize =
        first.map(m => 8 + pad8len(m._2.length)).sum + contMsgSize
      buf.u8(1); buf.u8(0) // version, reserved
      buf.u16(msgs.length + (if (rest.isEmpty) 0 else 1))
      buf.u32(1) // object reference count
      buf.u32(bodySize.toLong)
      buf.u32(0) // pad to 8-byte alignment of the message block
      first.foreach { case (tpe, body) => writeMsg(tpe, body) }
      if (rest.nonEmpty) {
        buf.u16(0x0010); buf.u16(16)
        buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0)
        val contOffAt = buf.u64(0) // patched below
        val contLenAt = buf.u64(0)
        buf.pad8()
        val contAddr = buf.pos
        rest.foreach { case (tpe, body) => writeMsg(tpe, body) }
        buf.patchU64(contOffAt, contAddr)
        buf.patchU64(contLenAt, buf.pos - contAddr)
      }
    }

    def writeGroup(g: GrpNode): (Long, Long, Long) = {
      // children first (their addresses go into this group's SNOD)
      val entries = g.children.toSeq.sortBy(_._1).map {
        case (name, DsNode(spec)) =>
          (name, writeDatasetOh(spec), 0, Undef, Undef)
        case (name, sub: GrpNode) =>
          val (oh, bt, hp) = writeGroup(sub)
          (name, oh, 1, bt, hp)
      }
      // local heap: 8 reserved bytes, then the names null-terminated,
      // 8-byte aligned (offset 0 names the empty string)
      val nameOff = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      var off = 8L
      entries.foreach { case (name, _, _, _, _) =>
        nameOff(name) = off
        off += pad8len(name.length + 1)
      }
      buf.pad8()
      val heapAddr = buf.pos
      buf.bytes("HEAP".getBytes(US_ASCII))
      buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0) // version + reserved
      buf.u64(off) // data segment size
      buf.u64(Undef) // free list head: none
      val heapDataAddr = heapAddr + 32
      buf.u64(heapDataAddr)
      require(buf.pos == heapDataAddr)
      buf.u64(0) // the 8 reserved bytes (offset 0: empty string)
      entries.foreach { case (name, _, _, _, _) =>
        buf.bytes(name.getBytes(US_ASCII)); buf.u8(0); buf.pad8()
      }
      // SNODs of up to 2*LeafK entries each (name-sorted — the B-tree
      // key contract), every node padded to its full allocated size so
      // a reader that fetches whole allocated nodes never lands past
      // end-of-file; wide groups take several SNODs — real dumps put
      // dozens of variables in one group
      val snodGroups =
        if (entries.isEmpty) Seq(Seq.empty) // an empty (root) group
        else entries.grouped(2 * LeafK).toSeq
      val snods = snodGroups.map { grp =>
        buf.pad8()
        val snodAddr = buf.pos
        buf.bytes("SNOD".getBytes(US_ASCII))
        buf.u8(1); buf.u8(0) // version, reserved
        buf.u16(grp.length)
        grp.foreach { case (name, oh, cache, bt, hp) =>
          buf.u64(nameOff(name))
          buf.u64(oh)
          buf.u32(cache.toLong); buf.u32(0)
          if (cache == 1) { buf.u64(bt); buf.u64(hp) }
          else { buf.u64(0); buf.u64(0) }
        }
        buf.zeroTo(snodAddr + 8 + 2L * LeafK * 40)
        (snodAddr, grp.lastOption.map(e => nameOff(e._1)).getOrElse(0L))
      }
      // group B-tree (node type 0) over the SNODs: as many levels as
      // the 2*LeafK node capacity needs, siblings wired, every node
      // padded to its allocation. Boundary keys are heap name offsets:
      // key_0 = 0 (the empty string, <= every name), key_{i+1} = the
      // LAST name of child i's subtree.
      val cap = 2 * LeafK
      val alloc = 24L + cap * 8 + (cap + 1) * 8
      def level(lvl: Int, children: Seq[(Long, Long)]): Long = {
        val groups = children.grouped(cap).toIndexedSeq
        val nodeAddrs = new Array[Long](groups.length)
        val summaries = groups.zipWithIndex.map { case (grp, gi) =>
          buf.pad8()
          val at = buf.pos
          nodeAddrs(gi) = at
          buf.bytes("TREE".getBytes(US_ASCII))
          buf.u8(0); buf.u8(lvl) // node type 0 (group), level
          buf.u16(grp.length)
          buf.u64(if (gi == 0) Undef else nodeAddrs(gi - 1))
          buf.u64(Undef) // right sibling, patched when the next lands
          // siblings SHARE the split key (left.lastKey == right.key_0,
          // the libhdf5 invariant): this node's left boundary is the
          // previous sibling's last-name key, 0 only for the first
          var prevLast =
            if (gi == 0) 0L else groups(gi - 1).last._2
          grp.foreach { case (child, lastName) =>
            buf.u64(prevLast) // key <= first name of this child
            buf.u64(child)
            prevLast = lastName
          }
          buf.u64(prevLast) // final key: last name in the subtree
          buf.zeroTo(at + alloc)
          if (gi > 0) buf.patchU64(nodeAddrs(gi - 1) + 16, at)
          (at, grp.last._2)
        }
        if (groups.length == 1) nodeAddrs(0)
        else level(lvl + 1, summaries)
      }
      val btAddr = level(0, snods)
      // group object header: one symbol table message
      buf.pad8()
      val ohAddr = buf.pos
      val stMsg = {
        val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        b.putLong(btAddr).putLong(heapAddr)
        b.array()
      }
      writeOh(ohAddr, Seq((0x0011, stMsg)))
      (ohAddr, btAddr, heapAddr)
    }

    val (rootOh, rootBt, rootHeap) = writeGroup(root)
    buf.patchU64(rootOhAt, rootOh)
    buf.patchU64(rootBtAt, rootBt)
    buf.patchU64(rootHeapAt, rootHeap)
    buf.patchU64(eofAt, buf.pos)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.result): Unit
  }

  // ------------------------------------------------------------------
  // Parser
  // ------------------------------------------------------------------

  def isHdf5(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == Signature(i))

  private final class Reader(raf: RandomAccessFile) {
    def at(addr: Long, n: Int): ByteBuffer = {
      require(addr >= 0 && addr + n <= raf.length(),
        s"HDF5: read of $n bytes at $addr overruns the file " +
          s"(${raf.length()} bytes)")
      val b = new Array[Byte](n)
      raf.seek(addr)
      raf.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }
    /** NUL-terminated heap string, BOUNDED by the heap's declared data
      * segment `[heapData, heapEnd)` — a corrupt name offset must fail
      * loudly, never fabricate a name from unrelated file bytes.
      */
    def cstring(addr: Long, heapData: Long, heapEnd: Long): String = {
      require(addr >= heapData && addr < heapEnd,
        s"HDF5: heap name offset $addr outside the local heap " +
          s"data segment [$heapData, $heapEnd)")
      val sb = new StringBuilder
      raf.seek(addr)
      var pos = addr
      var c = raf.read()
      while (c > 0) {
        pos += 1
        require(pos < heapEnd,
          s"HDF5: heap string at $addr runs past the data segment " +
            s"end $heapEnd without a terminator")
        sb.append(c.toChar); c = raf.read()
      }
      require(c == 0, s"HDF5: unterminated heap string at $addr")
      sb.toString
    }
  }

  /** Parse + VALIDATE the metadata of an HDF5 file in the supported
    * subset, returning the dataset index sorted by path. Dataset bytes
    * are not read; chunked datasets carry their (metadata-only) chunk
    * index.
    */
  def index(path: String): Seq[H5Dataset] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val r = new Reader(raf)
      val sb = r.at(0, 96)
      val sig = new Array[Byte](8); sb.get(sig)
      require(isHdf5(sig), "HDF5: bad signature")
      val sver = sb.get()
      require(sver == 0,
        s"HDF5: superblock version $sver (only v0 is decodable here)")
      sb.get(); sb.get(); sb.get() // fs/root versions, reserved
      sb.get() // shared header version
      val so = sb.get(); val sl = sb.get()
      require(so == 8 && sl == 8,
        s"HDF5: offsets/lengths of $so/$sl bytes (only 8/8 supported)")
      sb.get() // reserved
      sb.getShort(); sb.getShort() // K values (writer's are not binding)
      sb.getInt() // consistency flags
      val base = sb.getLong()
      require(base == 0, s"HDF5: nonzero base address $base unsupported")
      sb.getLong() // free space
      val eof = sb.getLong()
      require(eof == raf.length(),
        s"HDF5: end-of-file address $eof != file length ${raf.length()} " +
          "(truncated or appended-to file)")
      sb.getLong() // driver info
      sb.getLong() // root link name offset
      val rootOh = sb.getLong()
      val rootCache = sb.getInt()
      require(rootCache == 1,
        s"HDF5: root symbol-table entry cache type $rootCache (need 1)")
      sb.getInt()
      val rootBt = sb.getLong(); val rootHeap = sb.getLong()
      parseOhGroupCheck(r, rootOh, rootBt, rootHeap)

      val out = scala.collection.mutable.ArrayBuffer.empty[H5Dataset]
      // cycle guard: a crafted/corrupt file whose group entry points
      // back at an ancestor (its symbol-table message genuinely matches
      // the cached addresses, so parseOhGroupCheck passes) must fail
      // loudly, not recurse to StackOverflowError
      val visited = scala.collection.mutable.Set.empty[Long]
      def walkGroup(prefix: String, btAddr: Long, heapAddr: Long): Unit = {
        // cycle guard lives in walkNode (every B-tree node, any level)
        val hh = r.at(heapAddr, 32)
        val hsig = new Array[Byte](4); hh.get(hsig)
        require(new String(hsig, US_ASCII) == "HEAP",
          s"HDF5: no local heap at $heapAddr")
        require(hh.get() == 0, "HDF5: unsupported local heap version")
        hh.get(); hh.get(); hh.get()
        val segSize = hh.getLong()
        hh.getLong() // free list
        val heapData = hh.getLong()
        // the group B-tree: node type 0, ANY depth (libhdf5 splits
        // into internal nodes past 2K SNODs per node — wide real
        // groups hit this), children of level-0 nodes are SNODs
        def walkNode(addr: Long, expectLevel: Int): Unit = {
          require(visited.add(addr),
            s"HDF5: group B-tree cycle at $addr (at '$prefix')")
          val th = r.at(addr, 24)
          val tsig = new Array[Byte](4); th.get(tsig)
          require(new String(tsig, US_ASCII) == "TREE",
            s"HDF5: no B-tree node at $addr")
          require(th.get() == 0, "HDF5: B-tree node type != 0 (group)")
          val level = th.get() & 0xff
          require(expectLevel < 0 || level == expectLevel,
            s"HDF5: group B-tree level $level at $addr, expected " +
              s"$expectLevel (at '$prefix')")
          val nent = th.getShort() & 0xffff
          // siblings at +8, then nent+1 keys interleaved with children
          val kb = r.at(addr + 8, 16 + (2 * nent + 1) * 8)
          kb.getLong(); kb.getLong() // siblings
          (0 until nent).foreach { _ =>
            kb.getLong() // key
            val child = kb.getLong()
            if (level > 0) walkNode(child, level - 1)
            else walkSnod(child)
          }
        }
        def walkSnod(snodAddr: Long): Unit = {
          val sh = r.at(snodAddr, 8)
          val ssig = new Array[Byte](4); sh.get(ssig)
          require(new String(ssig, US_ASCII) == "SNOD",
            s"HDF5: no symbol-table node at $snodAddr")
          require(sh.get() == 1, "HDF5: unsupported SNOD version")
          sh.get()
          val nsym = sh.getShort() & 0xffff
          val eb = r.at(snodAddr + 8, nsym * 40)
          (0 until nsym).foreach { _ =>
            val nameOff = eb.getLong()
            val oh = eb.getLong()
            val cache = eb.getInt()
            eb.getInt()
            val s0 = eb.getLong(); val s1 = eb.getLong()
            val name =
              r.cstring(heapData + nameOff, heapData, heapData + segSize)
            require(name.nonEmpty,
              s"HDF5: empty link name in SNOD at $snodAddr")
            val full = if (prefix.isEmpty) name else s"$prefix/$name"
            require(cache == 0 || cache == 1,
              s"HDF5: symbol-table cache type $cache on '$full' " +
                "(symbolic links are outside the subset)")
            if (cache == 1) {
              parseOhGroupCheck(r, oh, s0, s1)
              walkGroup(full, s0, s1)
            } else {
              out += parseDatasetOh(r, full, oh)
            }
          }
        }
        walkNode(btAddr, -1)
      }
      walkGroup("", rootBt, rootHeap)
      out.sortBy(_.path).toSeq
    } finally raf.close()
  }

  /** Parse a v1 object header's messages: Seq of (type, body).
    * OBJECT HEADER CONTINUATION messages (0x0010) are followed — the
    * prefix's size field covers the FIRST message block only; each
    * continuation message carries the (offset, length) of a further
    * block, and the total message count comes from the prefix. Real
    * libhdf5 headers overflow into continuations routinely (filters,
    * fill values, attributes), so a reader without them cannot open
    * real dumps. Block addresses are cycle-guarded: a crafted
    * self-pointing continuation fails loudly.
    */
  private def ohMessages(r: Reader, addr: Long): Seq[(Int, ByteBuffer)] = {
    val h = r.at(addr, 16)
    val ver = h.get()
    require(ver == 1,
      s"HDF5: object header version $ver at $addr (only v1 supported)")
    h.get()
    val nmsg = h.getShort() & 0xffff
    h.getInt() // ref count
    val size = h.getInt()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, ByteBuffer)]
    val blocks = scala.collection.mutable.Queue((addr + 16, size.toLong))
    val seen = scala.collection.mutable.Set.empty[Long]
    var remaining = nmsg
    while (remaining > 0) {
      require(blocks.nonEmpty,
        s"HDF5: object header at $addr ran out of message blocks with " +
          s"$remaining of $nmsg messages unread")
      val (baddr, blen) = blocks.dequeue()
      require(seen.add(baddr),
        s"HDF5: object header continuation cycle at $baddr (header $addr)")
      val body = r.at(baddr, blen.toInt)
      // a block's tail may be <8 bytes of padding; messages never split
      while (remaining > 0 && body.remaining() >= 8) {
        val tpe = body.getShort() & 0xffff
        val msize = body.getShort() & 0xffff
        body.get(); body.get(); body.get(); body.get()
        require(body.remaining() >= msize,
          s"HDF5: message body overruns object header block at $baddr")
        val slice = body.slice().order(ByteOrder.LITTLE_ENDIAN)
        slice.limit(msize)
        body.position(body.position() + msize)
        if (tpe == 0x0010) {
          require(msize >= 16,
            s"HDF5: continuation message of $msize bytes at $baddr")
          val off = slice.getLong(); val len = slice.getLong()
          require(len > 0 && len <= Int.MaxValue,
            s"HDF5: continuation block length $len out of range " +
              s"(from $baddr)")
          blocks.enqueue((off, len))
        } else out += ((tpe, slice))
        remaining -= 1
      }
    }
    out.toSeq
  }

  /** A group's OH must carry the symbol-table message agreeing with the
    * entry's cached (btree, heap) — catches a dataset OH wired as a
    * group or a stale cache.
    */
  private def parseOhGroupCheck(r: Reader, addr: Long, bt: Long,
      heap: Long): Unit = {
    val st = ohMessages(r, addr).collectFirst { case (0x0011, b) => b }
    require(st.isDefined,
      s"HDF5: group object header at $addr has no symbol-table message")
    val b = st.get
    val mb = b.getLong(); val mh = b.getLong()
    require(mb == bt && mh == heap,
      s"HDF5: symbol-table message ($mb, $mh) disagrees with the " +
        s"cached entry ($bt, $heap) at $addr")
  }

  /** Walk a node-type-1 (raw data chunk) v1 B-tree of ANY depth,
    * collecting (key offsets, chunk address, stored size, filter mask)
    * from the leaves. Validates signatures, node types, the child
    * level sequence, and guards against cycles.
    */
  private def walkChunkTree(r: Reader, rootAddr: Long, path: String,
      rank: Int): Seq[(Array[Long], Long, Long, Int)] = {
    val keySize = 8 + 8 * (rank + 1)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Array[Long], Long, Long, Int)]
    val visited = scala.collection.mutable.Set.empty[Long]
    def walk(addr: Long, expectLevel: Int): Unit = {
      require(visited.add(addr),
        s"HDF5: chunk B-tree cycle at $addr ($path)")
      val h = r.at(addr, 8)
      val sig = new Array[Byte](4); h.get(sig)
      require(new String(sig, US_ASCII) == "TREE",
        s"HDF5: no chunk B-tree node at $addr ($path)")
      require(h.get() == 1,
        s"HDF5: B-tree node type != 1 (raw data) at $addr ($path)")
      val level = h.get() & 0xff
      require(expectLevel < 0 || level == expectLevel,
        s"HDF5: chunk B-tree level $level at $addr, expected " +
          s"$expectLevel ($path)")
      val nent = h.getShort() & 0xffff
      val kb = r.at(addr + 8, 16 + nent * (keySize + 8) + keySize)
      kb.getLong(); kb.getLong() // siblings
      (0 until nent).foreach { _ =>
        val stored = kb.getInt().toLong & 0xffffffffL
        val mask = kb.getInt()
        val offs = Array.fill(rank + 1)(kb.getLong())
        val child = kb.getLong()
        require(offs(rank) == 0,
          s"HDF5: chunk key's element-dim offset ${offs(rank)} != 0 " +
            s"($path)")
        if (level == 0) out += ((offs.take(rank), child, stored, mask))
        else walk(child, level - 1)
      }
      // the final boundary key is not a chunk; skip it
    }
    walk(rootAddr, -1)
    out.toSeq
  }

  private def parseDatasetOh(r: Reader, path: String,
      addr: Long): H5Dataset = {
    var dims: Array[Long] = null
    var le = false
    var elemSize = -1
    var layoutClass = -1
    var contAddr = Undef
    var contSize = -1L
    var chunkBt = Undef
    var chunkDimsRaw: Array[Long] = null
    var gzip = false
    var shuffle = false
    var shuffleElem = -1
    ohMessages(r, addr).foreach {
      case (0x0001, b) => // dataspace
        val ver = b.get()
        require(ver == 1,
          s"HDF5: dataspace version $ver on $path (only v1 supported)")
        val rank = b.get() & 0xff
        val flags = b.get()
        b.get(); b.get(); b.get(); b.get(); b.get() // reserved
        dims = Array.fill(rank)(b.getLong())
        if ((flags & 1) != 0) (0 until rank).foreach(_ => b.getLong())
      case (0x0003, b) => // datatype
        val cv = b.get() & 0xff
        require((cv >> 4) == 1 && (cv & 0x0f) == 1,
          s"HDF5: datatype class ${cv & 0x0f} version ${cv >> 4} on " +
            s"$path (only v1 floating-point is decodable here)")
        val bits0 = b.get() & 0xff
        le = (bits0 & 1) == 0
        b.get(); b.get()
        val size = b.getInt()
        require(size == 4 || size == 8,
          s"HDF5: $size-byte float on $path (only binary32/binary64)")
        val bitOffset = b.getShort(); val precision = b.getShort()
        require(bitOffset == 0 && precision == size * 8,
          s"HDF5: nonstandard float layout on $path " +
            s"(offset $bitOffset, precision $precision, size $size)")
        elemSize = size
      case (0x0008, b) => // data layout
        val ver = b.get()
        require(ver == 3,
          s"HDF5: layout message version $ver on $path (only v3)")
        layoutClass = b.get() & 0xff
        layoutClass match {
          case 1 => // contiguous
            contAddr = b.getLong()
            contSize = b.getLong()
          case 2 => // chunked: dimensionality, B-tree addr, chunk dims
            val dimen = b.get() & 0xff
            require(b.remaining() >= 8 + 4 * dimen,
              s"HDF5: chunked layout message on $path truncated " +
                s"(dimensionality $dimen)")
            chunkBt = b.getLong()
            chunkDimsRaw =
              Array.fill(dimen)(b.getInt().toLong & 0xffffffffL)
          case cls => throw new IllegalArgumentException(
            s"HDF5: layout class $cls on $path (only contiguous (1) " +
              "and chunked (2) are decodable here)")
        }
      case (0x000B, b) => // filter pipeline
        val ver = b.get()
        require(ver == 1,
          s"HDF5: filter pipeline version $ver on $path (only v1)")
        val nf = b.get() & 0xff
        b.get(); b.get(); b.getInt() // reserved
        val ids = (0 until nf).map { _ =>
          val id = b.getShort() & 0xffff
          val nameLen = b.getShort() & 0xffff
          b.getShort() // flags
          val ncv = b.getShort() & 0xffff
          require(nameLen % 8 == 0,
            s"HDF5: filter name length $nameLen not 8-aligned on $path")
          b.position(b.position() + nameLen)
          val cvals = (0 until ncv).map(_ => b.getInt())
          if (ncv % 2 == 1) b.getInt() // pad
          require(id == 1 || id == 2,
            s"HDF5: filter id $id on $path (only deflate (1) and " +
              "shuffle (2) are decodable here — a fletcher/szip chunk " +
              "would be silently mis-read)")
          (id, cvals)
        }
        // application order must be shuffle-then-deflate (h5py's) —
        // the inverse order would unshuffle compressed bytes
        require(ids.map(_._1) match {
          case Seq() | Seq(1) | Seq(2) | Seq(2, 1) => true
          case _ => false
        }, s"HDF5: filter order ${ids.map(_._1).mkString(",")} on " +
          s"$path (only [shuffle,] deflate is decodable here)")
        gzip = ids.exists(_._1 == 1)
        shuffle = ids.exists(_._1 == 2)
        shuffleElem = ids.collectFirst { case (2, cv) if cv.nonEmpty =>
          cv.head }.getOrElse(-1)
      case _ => () // NIL and other messages: skip
    }
    require(dims != null, s"HDF5: dataset $path has no dataspace")
    require(elemSize > 0, s"HDF5: dataset $path has no datatype")
    require(layoutClass > 0, s"HDF5: dataset $path has no data layout")
    val rank = dims.length
    layoutClass match {
      case 1 =>
        require(!gzip && !shuffle,
          s"HDF5: $path declares a filter pipeline on a contiguous " +
            "layout (filters apply to chunks only)")
        require(contAddr != Undef, s"HDF5: $path has no data address")
        require(contSize == dims.product * elemSize,
          s"HDF5: $path layout size $contSize != " +
            s"${dims.mkString("x")} x $elemSize-byte elements")
        H5Dataset(path, dims, le, elemSize, H5Contiguous(contAddr))
      case _ =>
        require(chunkDimsRaw.length == rank + 1,
          s"HDF5: $path chunk dimensionality ${chunkDimsRaw.length} " +
            s"!= rank+1 (${rank + 1})")
        require(chunkDimsRaw.last == elemSize,
          s"HDF5: $path chunk element-size dim ${chunkDimsRaw.last} " +
            s"!= datatype size $elemSize")
        val cd = chunkDimsRaw.dropRight(1)
        require(cd.forall(_ > 0), s"HDF5: $path has a zero chunk dim")
        require(cd.zip(dims).forall { case (c, n) => c <= n },
          s"HDF5: $path chunk ${cd.mkString("x")} exceeds dims " +
            s"${dims.mkString("x")}")
        require(chunkBt != Undef, s"HDF5: $path has no chunk B-tree")
        require(!shuffle || shuffleElem < 0 || shuffleElem == elemSize,
          s"HDF5: shuffle filter's element size $shuffleElem on $path " +
            s"disagrees with the $elemSize-byte datatype")
        val found = walkChunkTree(r, chunkBt, path, rank)
        val chunkElems = cd.product
        found.foreach { case (off, caddr, stored, mask) =>
          require(mask == 0,
            s"HDF5: chunk filter mask $mask on $path (partial filter " +
              "application is outside the subset)")
          require(off.indices.forall(d =>
              off(d) % cd(d) == 0 && off(d) >= 0 && off(d) < dims(d)),
            s"HDF5: chunk offset ${off.mkString(",")} not on the " +
              s"${cd.mkString("x")} grid of $path")
          require(caddr != Undef && caddr >= 0,
            s"HDF5: chunk at ${off.mkString(",")} of $path has no " +
              "address")
          if (!gzip) require(stored == chunkElems * elemSize,
            s"HDF5: unfiltered chunk at ${off.mkString(",")} of $path " +
              s"stores $stored bytes, expected ${chunkElems * elemSize}")
        }
        val expected = dims.zip(cd)
          .map { case (n, c) => (n + c - 1) / c }.product
        require(found.map(_._1.toSeq).distinct.length == found.length,
          s"HDF5: duplicate chunk offsets in $path")
        require(found.length == expected,
          s"HDF5: $path has ${found.length} allocated chunks of " +
            s"$expected — sparse/unallocated chunks (fill-value reads) " +
            "are outside the subset")
        // sort by offset lexicographically (B-tree order already is,
        // but the index contract is explicit)
        val sorted = found.sortWith { (a, b) =>
          val x = a._1; val y = b._1
          var d = 0
          while (d < x.length && x(d) == y(d)) d += 1
          d < x.length && x(d) < y(d)
        }.map { case (off, caddr, stored, _) =>
          H5Chunk(off, caddr, stored)
        }
        H5Dataset(path, dims, le, elemSize,
          H5Chunked(cd, gzip, shuffle, sorted))
    }
  }

  /** Read `n` elements of a dataset starting at row-major element
    * `offset`, widened to doubles — driver-side accessor for the tiny
    * axis datasets (contiguous OR chunked; a chunked axis decompresses
    * only the overlapping chunks); bulk variable data goes through the
    * DSv2 partition reader's own streaming.
    */
  def readDoubles(path: String, ds: H5Dataset, offset: Long,
      n: Int): Array[Double] = {
    require(offset >= 0 && offset + n <= ds.nElems,
      s"HDF5: read [$offset, ${offset + n}) of ${ds.nElems} elements " +
        s"(${ds.path})")
    val order = if (ds.littleEndian) ByteOrder.LITTLE_ENDIAN
                else ByteOrder.BIG_ENDIAN
    def decode(bb: ByteBuffer, i: Int): Double =
      if (ds.elemSize == 4) bb.getFloat(i * 4).toDouble
      else bb.getDouble(i * 8)
    val raf = new RandomAccessFile(path, "r")
    try ds.layout match {
      case H5Contiguous(dataAddress) =>
        val b = new Array[Byte](n * ds.elemSize)
        raf.seek(dataAddress + offset * ds.elemSize)
        raf.readFully(b)
        val bb = ByteBuffer.wrap(b).order(order)
        Array.tabulate(n)(i => decode(bb, i))
      case H5Chunked(cd, gzip, shuffle, chunks) =>
        val rank = ds.dims.length
        val strides = new Array[Long](rank)
        strides(rank - 1) = 1
        (rank - 2 to 0 by -1).foreach(d =>
          strides(d) = strides(d + 1) * ds.dims(d + 1))
        val chunkElems = cd.product.toInt
        val out = new Array[Double](n)
        chunks.foreach { ch =>
          // linear bounds of this chunk's in-bounds elements
          val lo = (0 until rank).map(d => ch.offset(d) * strides(d)).sum
          val hiCoord = (0 until rank).map(d =>
            math.min(ch.offset(d) + cd(d) - 1, ds.dims(d) - 1))
          val hi = (0 until rank).map(d => hiCoord(d) * strides(d)).sum
          if (hi >= offset && lo < offset + n) {
            val raw = new Array[Byte](ch.storedBytes.toInt)
            raf.seek(ch.addr)
            raf.readFully(raw)
            val bytes = decodeChunk(raw, chunkElems * ds.elemSize,
              gzip, shuffle, ds.elemSize)
            val bb = ByteBuffer.wrap(bytes).order(order)
            val local = new Array[Int](rank)
            (0 until chunkElems).foreach { li =>
              var inBounds = true
              var lin = 0L
              var d = 0
              while (d < rank) {
                val g = ch.offset(d) + local(d)
                if (g >= ds.dims(d)) inBounds = false
                lin += g * strides(d)
                d += 1
              }
              if (inBounds && lin >= offset && lin < offset + n)
                out((lin - offset).toInt) = decode(bb, li)
              var k = rank - 1
              while (k >= 0) {
                local(k) += 1
                if (local(k) < cd(k)) k = -1
                else { local(k) = 0; k -= 1 }
              }
            }
          }
        }
        out
    } finally raf.close()
  }
}
