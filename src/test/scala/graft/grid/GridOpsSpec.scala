package graft.grid

import graft.SharedSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GridOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Dense tiny grid: value = f(it, iz, ix); one time step by default. */
  def mkGrid(nz: Int, nx: Int, nt: Int = 1)(f: (Int, Int, Int) => Double): DataFrame =
    (for (it <- 0 until nt; iz <- 0 until nz; ix <- 0 until nx)
      yield (it, iz, ix, it.toDouble, iz * 0.5, ix * 0.5, f(it, iz, ix)))
      .toDF("it", "iz", "ix", "t", "z", "x", "v")

  test("mirror implements scipy 'reflect' boundary") {
    val df = Seq(-2, -1, 0, 3, 4, 5).toDF("j")
      .select(GridOps.mirror(col("j"), 4).as("m"))
    assert(df.as[Int].collect().toSeq == Seq(1, 0, 0, 3, 3, 2))
  }

  test("timeslice is inclusive on both ends; zoom auto-sorts bounds") {
    val g = mkGrid(4, 4, nt = 3)((it, _, _) => it.toDouble)
    assert(GridOps.timeslice(g, "t", 1.0, 2.0).count() == 32)
    // reversed bounds behave like sorted (statmeshvar.py:104 np.sort)
    assert(GridOps.zoom(g, Seq(("z", 1.0, 0.0))).count() ==
      GridOps.zoom(g, Seq(("z", 0.0, 1.0))).count())
  }

  test("fluxfn matches closed form on constant fields") {
    // b1=c1, b2=c2 => psi(iz,ix) = c2*d0*(iz+1) - c1*d1*(ix+1)
    val c1 = 2.0; val c2 = 3.0; val d0 = 0.5; val d1 = 0.5
    val g = mkGrid(4, 5)((_, _, _) => c1).withColumnRenamed("v", "b1")
      .withColumn("b2", lit(c2))
    val out = GridOps.fluxfn(g, "b1", "b2", d0, d1)
      .select("iz", "ix", "psi").as[(Int, Int, Double)].collect()
    out.foreach { case (iz, ix, psi) =>
      assert(math.abs(psi - (c2 * d0 * (iz + 1) - c1 * d1 * (ix + 1))) < 1e-12,
        s"psi($iz,$ix)=$psi")
    }
  }

  test("gradient is exact on linear fields, incl. one-sided edges") {
    // v = 2*z = iz (h=0.5) => dv/dz = 2 everywhere
    val g = mkGrid(5, 3)((_, iz, _) => iz.toDouble)
    val out = GridOps.gradient(g, "v", "iz", 0.5, "dvdz")
      .select("dvdz").as[Double].collect()
    assert(out.forall(_ == 2.0))
  }

  test("gaussian kernel is normalized and symmetric") {
    val k = GridOps.gaussianKernel(1.0).toMap
    assert(math.abs(k.values.sum - 1.0) < 1e-12)
    assert(k.keys.min == -4 && k.keys.max == 4) // r = int(4*sigma + 0.5)
    k.foreach { case (i, w) => assert(w == k(-i)) }
  }

  test("multi-column smoothing is bit-equal to per-column smooths") {
    val g = mkGrid(12, 9)((_, iz, ix) => math.sin(iz * 0.7) + ix * 0.3)
      .withColumn("w", col("v") * col("v") - 2.0)
    val multi = GridOps.gaussianSmoothAxesMulti(g,
        Seq("v" -> "sv", "w" -> "sw"), 1.0, Seq("iz" -> 12, "ix" -> 9))
      .select("it", "iz", "ix", "sv", "sw")
      .as[(Int, Int, Int, Double, Double)].collect().sortBy(r => (r._1, r._2, r._3))
    val sv = GridOps.gaussianSmooth(g, "v", 1.0, 12, 9, "sv")
      .select("it", "iz", "ix", "sv")
      .as[(Int, Int, Int, Double)].collect().sortBy(r => (r._1, r._2, r._3))
    val sw = GridOps.gaussianSmooth(g, "w", 1.0, 12, 9, "sw")
      .select("it", "iz", "ix", "sw")
      .as[(Int, Int, Int, Double)].collect().sortBy(r => (r._1, r._2, r._3))
    // bit equality, not tolerance: the fused pass must run the exact
    // same per-column expression tree as the single-column operator
    assert(multi.map(r => (r._1, r._2, r._3, r._4)).sameElements(sv))
    assert(multi.map(r => (r._1, r._2, r._3, r._5)).sameElements(sw))
  }

  test("gaussian smoothing preserves a constant field") {
    val g = mkGrid(8, 8)((_, _, _) => 7.0)
    val out = GridOps.gaussianSmooth(g, "v", 1.0, 8, 8, "sm")
      .select("sm").as[Double].collect()
    assert(out.length == 64)
    out.foreach(v => assert(math.abs(v - 7.0) < 1e-9))
  }

  test("3-D smoothing equals brute-force separable convolution on a volume") {
    val n = 6
    def f(iz: Int, iy: Int, ix: Int): Double = ((iz * 31 + iy * 13 + ix * 17) % 11).toDouble
    val g = (for (iz <- 0 until n; iy <- 0 until n; ix <- 0 until n)
      yield (0, iz, iy, ix, f(iz, iy, ix))).toDF("it", "iz", "iy", "ix", "v")
    val kern = GridOps.gaussianKernel(1.0)
    def ref(j: Int): Int = if (j < 0) -j - 1 else if (j >= n) 2 * n - 1 - j else j
    // separable brute force in the same z,y,x pass order
    var vol = Array.tabulate(n, n, n)((iz, iy, ix) => f(iz, iy, ix))
    def pass(get: (Int, Int, Int, Int) => Double): Array[Array[Array[Double]]] =
      Array.tabulate(n, n, n)((a, b, c) =>
        kern.map { case (k, w) => w * get(a, b, c, k) }.sum)
    vol = pass((iz, iy, ix, k) => vol(ref(iz + k))(iy)(ix))
    vol = pass((iz, iy, ix, k) => vol(iz)(ref(iy + k))(ix))
    vol = pass((iz, iy, ix, k) => vol(iz)(iy)(ref(ix + k)))
    val out = GridOps.gaussianSmoothAxes(g, "v", 1.0,
        Seq("iz" -> n, "iy" -> n, "ix" -> n), "sm")
      .select("iz", "iy", "ix", "sm").as[(Int, Int, Int, Double)].collect()
    assert(out.length == n * n * n)
    out.foreach { case (iz, iy, ix, got) =>
      assert(math.abs(got - vol(iz)(iy)(ix)) < 1e-9, s"sm($iz,$iy,$ix)")
    }
  }

  test("gradientAxes differentiates along iy on a 3-D linear field") {
    val n = 4
    val g = (for (iz <- 0 until n; iy <- 0 until n; ix <- 0 until n)
      yield (0, iz, iy, ix, 3.0 * iy + iz - ix)).toDF("it", "iz", "iy", "ix", "v")
    val out = GridOps.gradientAxes(g, "v", "iy", Seq("it", "iz", "ix"), 0.5, "dvdy")
      .select("dvdy").as[Double].collect()
    assert(out.length == n * n * n)
    out.foreach(v => assert(v == 6.0)) // d(3*iy)/dy with h=0.5
  }

  test("extremum filter matches 2-D brute force with reflect boundary") {
    val nz = 6; val nx = 6
    val vals = Array.tabulate(nz, nx)((iz, ix) => ((iz * 31 + ix * 17) % 11).toDouble)
    val g = mkGrid(nz, nx)((_, iz, ix) => vals(iz)(ix))
    def ref(j: Int, n: Int) = if (j < 0) -j - 1 else if (j >= n) 2 * n - 1 - j else j
    val out = GridOps.extremumFilter(g, "v", nz, nx, isMax = true, "mx")
      .select("iz", "ix", "mx").as[(Int, Int, Double)].collect()
    out.foreach { case (iz, ix, got) =>
      val exp = (for (di <- -5 to 4; dj <- -5 to 4)
        yield vals(ref(iz + di, nz))(ref(ix + dj, nx))).max
      assert(got == exp, s"max at ($iz,$ix)")
    }
  }

  test("gapFill bridges opposing neighbors and respects wraparound") {
    val on = Set((1, 1), (1, 3)) // bracket (1,2) horizontally
    val g = mkGrid(5, 5)((_, iz, ix) => if (on((iz, ix))) 1.0 else 0.0)
      .withColumn("m", col("v").cast("int"))
    val out = GridOps.gapFill(g, "m", 5, 5, "filled")
      .filter(col("filled") === 1)
      .select("iz", "ix").as[(Int, Int)].collect().toSet
    assert(out == Set((1, 1), (1, 3), (1, 2)))

    // wraparound: (0,0) and (0,4) are horizontal neighbors-of-neighbors
    // through the seam: receiver (0,0): L=(0,4), R=(0,1)... bracket via roll
    val g2 = mkGrid(5, 5)((_, iz, ix) => if (iz == 0 && (ix == 1 || ix == 4)) 1.0 else 0.0)
      .withColumn("m", col("v").cast("int"))
    val out2 = GridOps.gapFill(g2, "m", 5, 5, "filled")
      .filter(col("filled") === 1)
      .select("iz", "ix").as[(Int, Int)].collect().toSet
    // (0,0) has left neighbor (0,4) [wrap] and right neighbor (0,1) => filled
    assert(out2 == Set((0, 0), (0, 1), (0, 4)))
  }
}
