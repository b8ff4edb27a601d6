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
  *   - groups as the classic symbol-table machinery: v1 B-tree
  *     (node type 0) over SNOD symbol-table nodes with names in a
  *     local heap — one level, up to 2·K_leaf links per node;
  *   - datasets as v1 object headers carrying exactly the three
  *     messages a contiguous array needs — Dataspace (v1, simple),
  *     Datatype (class 1 floating-point, IEEE binary64), Data Layout
  *     (v3, class 1 contiguous) — with the raw block stored
  *     uncompressed at its declared address.
  *
  * Both byte orders of the f64 datatype are supported end to end
  * (HPC dumps ship both); everything OUTSIDE the subset — later
  * superblock versions, chunked/compressed layouts, non-f64 types,
  * deeper B-trees, header continuation blocks — is rejected LOUDLY
  * with a precise message, never silently mis-read (the WAV/AVI
  * parser discipline).
  *
  * The parser builds a metadata INDEX ONLY (paths, dims, data
  * addresses) by seeking through header structures; dataset bytes are
  * never materialized here — the DSv2 partition reader seeks straight
  * into a dataset's contiguous block and streams its own time-chunk,
  * which is the 100 TB ingest story ([[VPICSource]]).
  */
object Hdf5 {
  private val Signature: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, 0x0a)
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF: the undefined address
  private val LeafK = 4 // symbols per SNOD = 2 * LeafK

  /** One dataset in the index: slash-joined path, dimension sizes,
    * the contiguous raw block's file address, and its byte order.
    */
  final case class H5Dataset(path: String, dims: Array[Long],
      dataAddress: Long, littleEndian: Boolean) {
    def nElems: Long = dims.product
  }

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
    def patchU64(at: Long, v: Long): Unit = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(v)
      System.arraycopy(b.array(), 0, arr, at.toInt, 8)
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  private sealed trait Node
  private final case class DsNode(dims: Array[Long],
      data: Array[Double]) extends Node
  private final case class GrpNode(
      children: scala.collection.mutable.LinkedHashMap[String, Node])
    extends Node

  /** Write `datasets` (slash-joined path -> (dims, row-major f64
    * values)) as a real HDF5 file. Intermediate groups are created;
    * link order within a group is name-sorted (the B-tree contract).
    */
  def write(path: String,
      datasets: Seq[(String, Array[Long], Array[Double])],
      littleEndian: Boolean = false): Unit = {
    datasets.foreach { case (p, dims, data) =>
      require(dims.forall(_ > 0), s"HDF5 write: bad dims for $p")
      require(dims.product == data.length,
        s"HDF5 write: $p dims ${dims.mkString("x")} != ${data.length} values")
    }
    val root = GrpNode(scala.collection.mutable.LinkedHashMap.empty)
    datasets.foreach { case (p, dims, data) =>
      val parts = p.split('/').filter(_.nonEmpty)
      require(parts.nonEmpty, "HDF5 write: empty dataset path")
      var g = root
      parts.dropRight(1).foreach { seg =>
        g = g.children.getOrElseUpdate(seg,
          GrpNode(scala.collection.mutable.LinkedHashMap.empty)) match {
          case grp: GrpNode => grp
          case _: DsNode => throw new IllegalArgumentException(
            s"HDF5 write: $seg is both a dataset and a group on path $p")
        }
      }
      require(!g.children.contains(parts.last),
        s"HDF5 write: duplicate path $p")
      g.children(parts.last) = DsNode(dims, data)
    }

    val buf = new Buf
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

    def writeDatasetOh(ds: DsNode): Long = {
      // raw data first (the layout message needs its address)
      buf.pad8()
      val dataAddr = buf.pos
      val bb = ByteBuffer.allocate(ds.data.length * 8)
        .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN
               else ByteOrder.BIG_ENDIAN)
      ds.data.foreach(bb.putDouble)
      buf.bytes(bb.array())
      buf.pad8()
      val ohAddr = buf.pos
      // message bodies, 8-byte aligned
      val dspace = {
        val b = ByteBuffer.allocate(8 + ds.dims.length * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte).put(ds.dims.length.toByte)
          .put(0.toByte) // flags: no max dims
          .put(Array[Byte](0, 0, 0, 0, 0)) // reserved
        ds.dims.foreach(b.putLong)
        b.array()
      }
      val dtype = {
        val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
        b.put(0x11.toByte) // version 1, class 1 (floating point)
        // class bit field: bit0 byte order, bits4-5 mantissa norm = 2
        b.put((0x20 | (if (littleEndian) 0 else 1)).toByte)
        b.put(63.toByte).put(0.toByte) // sign location, reserved
        b.putInt(8) // size
        b.putShort(0).putShort(64) // bit offset, precision
        b.put(52.toByte).put(11.toByte) // exponent location, size
        b.put(0.toByte).put(52.toByte) // mantissa location, size
        b.putInt(1023) // exponent bias
        b.array() // 24 bytes (20 used + 4 implicit pad within alloc)
      }
      val layout = {
        val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
        b.put(3.toByte).put(1.toByte) // version 3, class 1 contiguous
        b.putLong(dataAddr).putLong(ds.data.length * 8L)
        b.array()
      }
      val msgs = Seq((0x0001, dspace), (0x0003, dtype), (0x0008, layout))
      writeOh(ohAddr, msgs)
      ohAddr
    }

    def pad8len(n: Int): Int = (n + 7) & ~7
    def writeOh(at: Long, msgs: Seq[(Int, Array[Byte])]): Unit = {
      require(buf.pos == at)
      val bodySize = msgs.map(m => 8 + pad8len(m._2.length)).sum
      buf.u8(1); buf.u8(0) // version, reserved
      buf.u16(msgs.length)
      buf.u32(1) // object reference count
      buf.u32(bodySize.toLong)
      buf.u32(0) // pad to 8-byte alignment of the message block
      msgs.foreach { case (tpe, body) =>
        buf.u16(tpe); buf.u16(pad8len(body.length))
        buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0) // flags + reserved
        buf.bytes(body)
        buf.pad8()
      }
    }

    def writeGroup(g: GrpNode): (Long, Long, Long) = {
      // children first (their addresses go into this group's SNOD)
      val entries = g.children.toSeq.sortBy(_._1).map {
        case (name, ds: DsNode) =>
          (name, writeDatasetOh(ds), 0, Undef, Undef)
        case (name, sub: GrpNode) =>
          val (oh, bt, hp) = writeGroup(sub)
          (name, oh, 1, bt, hp)
      }
      require(entries.length <= 2 * LeafK,
        s"HDF5 write: ${entries.length} links in one group exceeds one " +
          s"symbol-table node (${2 * LeafK}); split the tree")
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
      // SNOD with every entry (name-sorted — the B-tree key contract)
      buf.pad8()
      val snodAddr = buf.pos
      buf.bytes("SNOD".getBytes(US_ASCII))
      buf.u8(1); buf.u8(0) // version, reserved
      buf.u16(entries.length)
      entries.foreach { case (name, oh, cache, bt, hp) =>
        buf.u64(nameOff(name))
        buf.u64(oh)
        buf.u32(cache.toLong); buf.u32(0)
        if (cache == 1) { buf.u64(bt); buf.u64(hp) }
        else { buf.u64(0); buf.u64(0) }
      }
      // B-tree: one leaf node, one child (the SNOD)
      buf.pad8()
      val btAddr = buf.pos
      buf.bytes("TREE".getBytes(US_ASCII))
      buf.u8(0); buf.u8(0) // node type 0 (group), level 0
      buf.u16(1) // entries used
      buf.u64(Undef); buf.u64(Undef) // siblings
      buf.u64(0) // key 0: <= first name (empty string)
      buf.u64(snodAddr)
      buf.u64(entries.lastOption.map(e => nameOff(e._1)).getOrElse(0L))
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
    def cstring(addr: Long): String = {
      val sb = new StringBuilder
      raf.seek(addr)
      var c = raf.read()
      while (c > 0) { sb.append(c.toChar); c = raf.read() }
      require(c == 0, s"HDF5: unterminated heap string at $addr")
      sb.toString
    }
  }

  /** Parse + VALIDATE the metadata of an HDF5 file in the supported
    * subset, returning the dataset index sorted by path. Dataset bytes
    * are not read.
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
        require(visited.add(btAddr),
          s"HDF5: group cycle — B-tree at $btAddr reached twice " +
            s"(at '$prefix')")
        val hh = r.at(heapAddr, 32)
        val hsig = new Array[Byte](4); hh.get(hsig)
        require(new String(hsig, US_ASCII) == "HEAP",
          s"HDF5: no local heap at $heapAddr")
        require(hh.get() == 0, "HDF5: unsupported local heap version")
        hh.get(); hh.get(); hh.get()
        hh.getLong(); hh.getLong() // segment size, free list
        val heapData = hh.getLong()
        val th = r.at(btAddr, 24)
        val tsig = new Array[Byte](4); th.get(tsig)
        require(new String(tsig, US_ASCII) == "TREE",
          s"HDF5: no B-tree node at $btAddr")
        require(th.get() == 0, "HDF5: B-tree node type != 0 (group)")
        val level = th.get()
        require(level == 0,
          s"HDF5: B-tree level $level (only single-level trees are " +
            "decodable here — a deeper tree would be silently truncated)")
        val nent = th.getShort() & 0xffff
        // siblings at +8, then nent+1 keys interleaved with nent children
        val kb = r.at(btAddr + 8, 16 + (2 * nent + 1) * 8)
        kb.getLong(); kb.getLong() // siblings
        (0 until nent).foreach { _ =>
          kb.getLong() // key
          val snodAddr = kb.getLong()
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
            val name = r.cstring(heapData + nameOff)
            require(name.nonEmpty,
              s"HDF5: empty link name in SNOD at $snodAddr")
            val full = if (prefix.isEmpty) name else s"$prefix/$name"
            if (cache == 1) {
              parseOhGroupCheck(r, oh, s0, s1)
              walkGroup(full, s0, s1)
            } else {
              out += parseDatasetOh(r, full, oh)
            }
          }
        }
      }
      walkGroup("", rootBt, rootHeap)
      out.sortBy(_.path).toSeq
    } finally raf.close()
  }

  /** Parse a v1 object header's messages: Seq of (type, body). */
  private def ohMessages(r: Reader, addr: Long): Seq[(Int, ByteBuffer)] = {
    val h = r.at(addr, 16)
    val ver = h.get()
    require(ver == 1,
      s"HDF5: object header version $ver at $addr (only v1 supported)")
    h.get()
    val nmsg = h.getShort() & 0xffff
    h.getInt() // ref count
    val size = h.getInt()
    val body = r.at(addr + 16, size)
    (0 until nmsg).map { _ =>
      require(body.remaining() >= 8,
        s"HDF5: object header at $addr truncated mid-message")
      val tpe = body.getShort() & 0xffff
      val msize = body.getShort() & 0xffff
      body.get(); body.get(); body.get(); body.get()
      require(body.remaining() >= msize,
        s"HDF5: message body overruns object header at $addr")
      require(tpe != 0x0010,
        "HDF5: object header continuation blocks are not supported " +
          "here — the subset writer never emits them")
      val slice = body.slice().order(ByteOrder.LITTLE_ENDIAN)
      slice.limit(msize)
      body.position(body.position() + msize)
      (tpe, slice)
    }
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

  private def parseDatasetOh(r: Reader, path: String,
      addr: Long): H5Dataset = {
    var dims: Array[Long] = null
    var le = false
    var sawType = false
    var dataAddr = Undef
    var dataSize = -1L
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
        require(size == 8,
          s"HDF5: $size-byte float on $path (only binary64 supported)")
        val bitOffset = b.getShort(); val precision = b.getShort()
        require(bitOffset == 0 && precision == 64,
          s"HDF5: nonstandard float layout on $path " +
            s"(offset $bitOffset, precision $precision)")
        sawType = true
      case (0x0008, b) => // data layout
        val ver = b.get()
        require(ver == 3,
          s"HDF5: layout message version $ver on $path (only v3)")
        val cls = b.get()
        require(cls == 1,
          s"HDF5: layout class $cls on $path (only contiguous — a " +
            "chunked/compact dataset would be silently mis-read)")
        dataAddr = b.getLong()
        dataSize = b.getLong()
      case _ => () // NIL and other messages: skip
    }
    require(dims != null, s"HDF5: dataset $path has no dataspace")
    require(sawType, s"HDF5: dataset $path has no datatype")
    require(dataAddr != Undef, s"HDF5: dataset $path has no data layout")
    require(dataSize == dims.product * 8,
      s"HDF5: $path layout size $dataSize != " +
        s"${dims.mkString("x")} f64 elements")
    H5Dataset(path, dims, dataAddr, le)
  }

  /** Read `n` doubles of a dataset starting at element `offset` —
    * driver-side accessor for the tiny axis datasets; bulk variable
    * data goes through the DSv2 partition reader's own streaming.
    */
  def readDoubles(path: String, ds: H5Dataset, offset: Long,
      n: Int): Array[Double] = {
    require(offset >= 0 && offset + n <= ds.nElems,
      s"HDF5: read [$offset, ${offset + n}) of ${ds.nElems} elements " +
        s"(${ds.path})")
    val raf = new RandomAccessFile(path, "r")
    try {
      val b = new Array[Byte](n * 8)
      raf.seek(ds.dataAddress + offset * 8)
      raf.readFully(b)
      val bb = ByteBuffer.wrap(b).order(
        if (ds.littleEndian) ByteOrder.LITTLE_ENDIAN
        else ByteOrder.BIG_ENDIAN)
      Array.fill(n)(bb.getDouble())
    } finally raf.close()
  }
}
