package graft.sources

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the DSv2 VPIC reader: for random tree shapes,
  * chunk sizes, and time-filter windows, the scan must return exactly
  * the generator's cells — chunk boundaries and planning-time pruning
  * must never drop or duplicate a row.
  */
class VPICPropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))

  lazy val spark = SharedSpark.spark

  private val shapes = for {
    nt <- Gen.choose(1, 6)
    nz <- Gen.choose(1, 4)
    ny <- Gen.choose(1, 3) // 1 = the degenerate-y (2-D) case
    nx <- Gen.choose(1, 5)
    chunk <- Gen.choose(1, 7)
    lo <- Gen.choose(0, nt - 1)
    hi <- Gen.choose(lo, nt - 1)
  } yield (nt, nz, ny, nx, chunk, lo, hi)

  test("random shapes x chunk sizes x it-windows read exactly the written cells") {
    samples(shapes, 12).foreach { case (nt, nz, ny, nx, chunk, lo, hi) =>
      val dir = java.nio.file.Files.createTempDirectory("vpic_prop").toString
      def f(it: Int, iz: Int, iy: Int, ix: Int): Double =
        it * 100000.0 + iz * 1000.0 + iy * 100.0 + ix
      VPICSource.writeMock(dir,
        Array.tabulate(nt)(_.toDouble), Array.tabulate(nz)(_ * 0.5),
        Array.tabulate(ny)(_ * 0.75), Array.tabulate(nx)(_ * 0.25),
        Map("g/v" -> (f _)))
      val scan = spark.read.format("graft-vpic")
        .option("path", dir).option("chunkSteps", chunk.toString).load()
      val got = scan.filter(col("it") >= lo && col("it") <= hi)
        .select("it", "iz", "iy", "ix", "value").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getDouble(4)))
        .toSet
      val want = (for (it <- lo to hi; iz <- 0 until nz; iy <- 0 until ny;
          ix <- 0 until nx)
        yield (it, iz, iy, ix, f(it, iz, iy, ix))).toSet
      assert(got == want,
        s"shape nt=$nt nz=$nz ny=$ny nx=$nx chunk=$chunk window=[$lo,$hi]")
    }
  }
}
