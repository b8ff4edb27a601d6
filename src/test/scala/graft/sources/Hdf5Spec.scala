package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM HDF5 subset codec: write -> index -> read round-trips,
  * both byte orders, and LOUD rejection of everything outside the
  * declared subset (the WAV/AVI parser discipline).
  */
class Hdf5Spec extends AnyFunSuite {
  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_h5").resolve("t.h5").toString

  private def roundTrip(littleEndian: Boolean): Unit = {
    val rnd = new scala.util.Random(if (littleEndian) 51 else 50)
    val p = tmp()
    val dsets = Seq(
      ("grid/time", Array(3L), Array(0.0, 0.5, 1.0)),
      ("fields/ex", Array(2L, 3L, 4L),
        Array.fill(24)(rnd.nextDouble() * 2000 - 1000)),
      ("fields/deep/bz", Array(6L), Array.fill(6)(rnd.nextGaussian())),
      ("ne", Array(1L), Array(42.0)))
    Hdf5.write(p, dsets, littleEndian)
    val idx = Hdf5.index(p)
    assert(idx.map(_.path) ==
      Seq("fields/deep/bz", "fields/ex", "grid/time", "ne"))
    assert(idx.forall(_.littleEndian == littleEndian))
    dsets.foreach { case (path, dims, data) =>
      val d = idx.find(_.path == path).get
      assert(d.dims.toSeq == dims.toSeq)
      // full read AND an offset slice both reproduce the exact doubles
      assert(Hdf5.readDoubles(p, d, 0, d.nElems.toInt).toSeq == data.toSeq)
      if (data.length > 2)
        assert(Hdf5.readDoubles(p, d, 1, data.length - 2).toSeq ==
          data.toSeq.slice(1, data.length - 1))
    }
  }

  test("write/index/read round-trips exact doubles (big-endian f64)") {
    roundTrip(littleEndian = false)
  }

  test("write/index/read round-trips exact doubles (little-endian f64)") {
    roundTrip(littleEndian = true)
  }

  test("groups nest; a path through a dataset or a duplicate path is " +
    "rejected at write time; link fan-out beyond one SNOD is rejected") {
    val p = tmp()
    intercept[IllegalArgumentException](Hdf5.write(p, Seq(
      ("a/b", Array(1L), Array(1.0)),
      ("a/b/c", Array(1L), Array(2.0)))))
    intercept[IllegalArgumentException](Hdf5.write(p, Seq(
      ("a/b", Array(1L), Array(1.0)),
      ("a/b", Array(1L), Array(2.0)))))
    intercept[IllegalArgumentException](Hdf5.write(p,
      (0 to 8).map(i => (s"g/d$i", Array(1L), Array(i.toDouble)))))
    // exactly 8 links (= 2 * leaf K) still fits one symbol-table node
    Hdf5.write(p, (0 until 8).map(i =>
      (s"g/d$i", Array(1L), Array(i.toDouble))))
    assert(Hdf5.index(p).map(_.path) == (0 until 8).map(i => s"g/d$i"))
  }

  test("a crafted group cycle is rejected loudly, not a stack overflow") {
    import java.nio.{ByteBuffer, ByteOrder}
    val p = tmp()
    Hdf5.write(p, Seq(("g/d", Array(1L), Array(1.0))))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    def u64(at: Int): Long =
      ByteBuffer.wrap(b, at, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    def put64(at: Int, v: Long): Unit = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(v)
      System.arraycopy(bb.array(), 0, b, at, 8)
    }
    // the superblock's root entry: oh @64, scratch btree @80, heap @88
    val rootOh = u64(64); val rootBt = u64(80); val rootHeap = u64(88)
    // groups are written bottom-up, so the ROOT group's SNOD is the
    // second one; rewire its single entry ("g") back at the root —
    // the group check passes (root's symbol-table message genuinely
    // matches those addresses), so only a cycle guard can catch this
    val snods = (0 until b.length - 4).filter(i =>
      b(i) == 'S' && b(i + 1) == 'N' && b(i + 2) == 'O' && b(i + 3) == 'D')
    assert(snods.length == 2)
    val e = snods(1) + 8 // first symbol entry
    put64(e + 8, rootOh); put64(e + 24, rootBt); put64(e + 32, rootHeap)
    val f = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(f), b)
    val ex = intercept[IllegalArgumentException](Hdf5.index(f))
    assert(ex.getMessage.contains("cycle"), ex.getMessage)
  }

  test("malformed or out-of-subset files are rejected loudly") {
    val p = tmp()
    Hdf5.write(p, Seq(("fields/ex", Array(2L, 2L), Array(1.0, 2, 3, 4))))
    val good = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    def reject(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val bad = mutate(good.clone())
      val f = tmp()
      java.nio.file.Files.write(java.nio.file.Paths.get(f), bad)
      val e = intercept[IllegalArgumentException](Hdf5.index(f))
      assert(e.getMessage.contains("HDF5"), s"$what: ${e.getMessage}")
    }
    // not an HDF5 file at all
    reject(b => { b(0) = 'X'; b }, "signature")
    // later superblock version
    reject(b => { b(8) = 2; b }, "superblock version")
    // truncation breaks the recorded end-of-file address
    reject(_.dropRight(1), "truncation")
    // find the one datatype message ((ver<<4)|class = 0x11 followed by
    // our exact bit fields) and flip its class to integer
    val sigAt = {
      var at = -1
      var i = 96
      while (at < 0 && i < good.length - 4) {
        if (good(i) == 0x11 && (good(i + 1) == 0x21.toByte)
          && good(i + 2) == 63.toByte && good(i + 3) == 0) at = i
        i += 1
      }
      at
    }
    assert(sigAt > 0, "datatype message not found in fixture")
    reject(b => { b(sigAt) = 0x10; b }, "datatype class")
    // flip the layout message's class (contiguous -> chunked): the
    // layout body starts with version 3, class 1; locate via message
    // type 0x0008 header (08 00 size...) then body at +8
    val layAt = {
      var at = -1
      var i = 96
      while (at < 0 && i < good.length - 10) {
        if (good(i) == 8 && good(i + 1) == 0 && good(i + 4) == 0
          && good(i + 8) == 3 && good(i + 9) == 1) at = i + 9
        i += 1
      }
      at
    }
    assert(layAt > 0, "layout message not found in fixture")
    reject(b => { b(layAt) = 2; b }, "layout class")
  }
}
