package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the HDF5 subset codec: random dataset trees —
  * random group nesting and widths (incl. past one SNOD and past one
  * B-tree node), ranks, dims, chunk grids that do and do not divide
  * the dims, deflate on/off, f32/f64, both byte orders — must
  * round-trip write → index → readDoubles EXACTLY (f32 compared
  * after the same widening the reader performs). Fixture tests pin
  * specific structures (golden bytes, multi-level trees); this spec
  * sweeps the combinatorial space where an off-by-one in chunk-grid
  * arithmetic, heap padding, SNOD splitting, or edge-chunk overhang
  * would hide.
  */
class Hdf5PropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(431L + i)))

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_h5prop").resolve("t.h5").toString

  private val genDataset: Gen[(Array[Long], Option[Array[Long]],
      Boolean, Boolean, Boolean)] = for {
    rank <- Gen.choose(1, 4)
    dims <- Gen.listOfN(rank, Gen.choose(1L, 9L)).map(_.toArray)
    chunked <- Gen.oneOf(true, true, false) // bias: the real-dump shape
    chunkDims <-
      if (!chunked) Gen.const(None)
      else Gen.sequence[List[Long], Long](
        dims.toList.map(d => Gen.choose(1L, d))).map(l => Some(l.toArray))
    gzip <- if (chunked) Gen.oneOf(true, false) else Gen.const(false)
    shuffle <- if (chunked) Gen.oneOf(true, false) else Gen.const(false)
    f32 <- Gen.oneOf(true, false)
  } yield (dims, chunkDims, gzip, f32, shuffle)

  private val genTree: Gen[(Seq[(String, (Array[Long], Option[Array[Long]],
      Boolean, Boolean, Boolean))], Boolean)] = for {
    // widths past one SNOD (8) and occasionally past one B-tree leaf's
    // SNOD capacity in a nested group
    n <- Gen.frequency((4, Gen.choose(1, 6)), (2, Gen.choose(9, 20)),
      (1, Gen.const(70)))
    depth <- Gen.choose(0, 2)
    specs <- Gen.listOfN(n, genDataset)
    le <- Gen.oneOf(true, false)
  } yield (specs.zipWithIndex.map { case (s, i) =>
    val seg = (0 until depth).map(d => s"g${i % (d + 2)}").mkString("/")
    val path = if (seg.isEmpty) f"d$i%03d" else s"$seg/d$i%03d"
    (path, s)
  }, le)

  test("random trees round-trip exactly: index finds every path with " +
    "its dims/layout, full reads and interior slices reproduce the " +
    "values, edge chunks never leak fill") {
    val rnd = new scala.util.Random(77)
    samples(genTree, 40).zipWithIndex.foreach { case ((specs, le), ti) =>
      // paths must be unique and never both group and dataset — the
      // generator guarantees it by construction (d-names are leaves)
      val writes = specs.map { case (path, (dims, cd, gzip, f32, sh)) =>
        val data = Array.fill(dims.product.toInt)(
          rnd.nextDouble() * 2000 - 1000)
        Hdf5.H5Write(path, dims, data, cd, gzip, f32, shuffle = sh)
      }
      val p = tmp()
      Hdf5.writeSpecs(p, writes, le)
      val idx = Hdf5.index(p)
      assert(idx.map(_.path) == writes.map(_.path).sorted,
        s"tree $ti: path set drifted")
      writes.foreach { w =>
        val d = idx.find(_.path == w.path).get
        assert(d.dims.toSeq == w.dims.toSeq, s"tree $ti ${w.path}")
        assert(d.littleEndian == le && d.elemSize == (if (w.f32) 4 else 8))
        (d.layout, w.chunkDims) match {
          case (Hdf5.H5Contiguous(_), None) => ()
          case (Hdf5.H5Chunked(cd, gz, sh, chunks), Some(wcd)) =>
            assert(cd.toSeq == wcd.toSeq && gz == w.gzip && sh == w.shuffle)
            val expect = w.dims.zip(wcd)
              .map { case (n, c) => (n + c - 1) / c }.product
            assert(chunks.length == expect, s"tree $ti ${w.path}")
          case (got, want) => fail(s"tree $ti ${w.path}: $got vs $want")
        }
        val want =
          if (w.f32) w.data.map(v => v.toFloat.toDouble).toSeq
          else w.data.toSeq
        val n = w.data.length
        assert(Hdf5.readDoubles(p, d, 0, n).toSeq == want,
          s"tree $ti ${w.path} full read")
        if (n > 2) {
          val off = 1 + (w.path.length % (n - 2))
          val len = 1 + (n - off - 1).min(5)
          assert(Hdf5.readDoubles(p, d, off, len).toSeq ==
            want.slice(off, off + len), s"tree $ti ${w.path} slice")
        }
      }
    }
  }
}
