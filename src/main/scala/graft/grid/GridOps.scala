package graft.grid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core operators over long-format grid variables
  * (columns `it, iz, ix, <value>` — SURVEY.md §1.3).
  *
  * Design: every stencil is a scatter (explode over the offset list) +
  * one hash aggregation on the destination cell — a single shuffle keyed
  * by (it, iz, ix), which at 100 TB co-partitions with time-partitioned
  * storage. Prefix-sum operators are window functions partitioned by
  * (it, row) so Spark parallelizes across rows/time steps; nothing is
  * collected to the driver.
  */
object GridOps {

  /** Guard for the n-d window operators: (it + dims) must uniquely key
    * the rows, so every index column present in the frame has to be
    * LISTED in dims — a 2-D smoothing call on a grid that still carries
    * an `iy` column would otherwise window over interleaved y planes
    * and silently mix values across them.
    */
  private def requireAllIndexDims(df: DataFrame, dims: Seq[String]): Unit = {
    val leftover = df.columns.toSet
      .intersect(Set("iz", "iy", "ix")) -- dims
    require(leftover.isEmpty,
      s"grid has index dimensions ${leftover.mkString(", ")} not listed in " +
        s"dims (${dims.mkString(", ")}): the window would mix planes")
  }

  /** scipy boundary mode 'reflect' ((d c b a | a b c d | d c b a)):
    * j < 0 -> -j-1 ; j >= n -> 2n-1-j. Valid for |offset| <= n.
    * Cited semantics: scipy.ndimage.gaussian_filter default mode, used at
    * /root/reference/src/datasets/vpicdataset.py:364-365.
    */
  def mirror(j: Column, n: Int): Column =
    when(j < 0, -j - 1).when(j >= n, lit(2 * n - 1) - j).otherwise(j)

  /** Inclusive time-range filter (reference `_timeslice`,
    * /root/reference/src/variables/statmeshvar.py:95-100). Plain predicate:
    * partition-prunes when the table is partitioned by `it`/`t`.
    */
  def timeslice(df: DataFrame, tCol: String, tmin: Double, tmax: Double): DataFrame =
    df.filter(col(tCol).between(tmin, tmax))

  /** Inclusive per-dimension spatial range filter with auto-sorted bounds
    * (reference `_zoom`, statmeshvar.py:102-109; ±inf = no-op per axis).
    */
  def zoom(df: DataFrame, ranges: Seq[(String, Double, Double)]): DataFrame =
    ranges.foldLeft(df) { case (acc, (c, a, b)) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      acc.filter(col(c).between(lo, hi))
    }

  /** Flux function psi from 2-D field components (reference `calc_fluxfn`,
    * vpicdataset.py:247-293): IC = running sum of b2*d0 along iz at ix=0;
    * psi = running sum of -b1*d1 along ix + IC. Two window prefix sums —
    * the additions happen in the same left-to-right order as np.cumsum.
    */
  def fluxfn(df: DataFrame, b1: String, b2: String,
      d0: Double, d1: Double): DataFrame = {
    requireAllIndexDims(df, Seq("iz", "ix"))
    val wz = Window.partitionBy("it").orderBy("iz")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ic = df.filter(col("ix") === 0)
      .withColumn("ic", sum(col(b2) * d0).over(wz))
      .select(col("it").as("ic_it"), col("iz").as("ic_iz"), col("ic"))
    val wx = Window.partitionBy("it", "iz").orderBy("ix")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(-col(b1) * d1).over(wx))
      .join(ic, col("it") === col("ic_it") && col("iz") === col("ic_iz"))
      .withColumn("psi", col("cum") + col("ic"))
      .drop("ic_it", "ic_iz", "cum", "ic")
  }

  /** Central-difference gradient along one index dimension with one-sided
    * edges, uniform spacing h (np.gradient semantics for uniform meshes;
    * reference use at vpicdataset.py:378-379).
    * `dim` = "iz" (partition by it, ix) or "ix" (partition by it, iz).
    */
  def gradient(df: DataFrame, value: String, dim: String, h: Double,
      out: String): DataFrame =
    gradientAxes(df, value, dim,
      if (dim == "iz") Seq("it", "ix") else Seq("it", "iz"), h, out)

  /** [[gradient]] with an explicit partition-key list — the n-d form:
    * `others` = every index dimension EXCEPT `dim` (time included), so a
    * 3-D field differentiates along iy with others = (it, iz, ix).
    */
  def gradientAxes(df: DataFrame, value: String, dim: String,
      others: Seq[String], h: Double, out: String): DataFrame = {
    requireAllIndexDims(df, others :+ dim)
    val w = Window.partitionBy(others.map(col): _*).orderBy(dim)
    val fp = lead(col(value), 1).over(w)
    val fm = lag(col(value), 1).over(w)
    df.withColumn(out,
      when(fm.isNull, (fp - col(value)) / h)
        .when(fp.isNull, (col(value) - fm) / h)
        .otherwise((fp - fm) / (2 * h)))
  }

  /** np.gradient parity on NON-uniform meshes (reference passes the
    * coordinate arrays at vpicdataset.py:378-379): interior points use
    * the quadratic-exact formula
    *   (hd²·f₊ + (hs²−hd²)·f − hs²·f₋) / (hs·hd·(hs+hd))
    * with hd = x−x₋ (spacing before), hs = x₊−x (after); edges are
    * one-sided differences.
    * `coordCol` carries the physical coordinate for `dim`.
    */
  def gradientNonUniform(df: DataFrame, value: String, dim: String,
      coordCol: String, out: String): DataFrame = {
    requireAllIndexDims(df, Seq("iz", "ix"))
    val part = if (dim == "iz") Seq("it", "ix") else Seq("it", "iz")
    val w = Window.partitionBy(part.map(col): _*).orderBy(dim)
    val fp = lead(col(value), 1).over(w); val fm = lag(col(value), 1).over(w)
    val xp = lead(col(coordCol), 1).over(w); val xm = lag(col(coordCol), 1).over(w)
    val hs = xp - col(coordCol); val hd = col(coordCol) - xm
    df.withColumn(out,
      when(fm.isNull, (fp - col(value)) / hs)
        .when(fp.isNull, (col(value) - fm) / hd)
        .otherwise((hd * hd * fp + (hs * hs - hd * hd) * col(value) - hs * hs * fm)
          / (hs * hd * (hs + hd))))
  }

  /** scipy-style truncated Gaussian kernel, normalized; radius =
    * int(truncate*sigma + 0.5), truncate = 4.0 (scipy default used by the
    * reference at vpicdataset.py:364).
    */
  def gaussianKernel(sigma: Double): Seq[(Int, Double)] = {
    val r = (4.0 * sigma + 0.5).toInt
    val raw = (-r to r).map(k => k -> math.exp(-0.5 * k * k / (sigma * sigma)))
    val s = raw.map(_._2).sum
    raw.map { case (k, v) => k -> v / s }
  }

  /** Mirrored ghost rows implementing the reflect boundary for a window
    * pass along `dim`: real rows then see all their neighbors via
    * lag/lead, so one window (one shuffle/sort) replaces a join+agg pair.
    * Ghosts land at out-of-range indices and are filtered after the pass.
    *
    * Emitted with ONE explode over a per-row conditional position array —
    * a union of boundary filters would evaluate the upstream plan three
    * times, which matters when the input is itself a window pass (the
    * second leg of every separable stencil).
    */
  private def withReflectGhosts(df: DataFrame, dim: String, n: Int,
      rLow: Int, rHigh: Int): DataFrame = {
    val d = col(dim)
    val positions = filter(array(
      d,
      when(d < rLow, -d - 1),
      when(d >= n - rHigh, lit(2 * n - 1) - d)), p => p.isNotNull)
    df.withColumn(dim, explode(positions))
  }

  /** Separable 2-D Gaussian smoothing (z pass then x pass), reflect
    * boundary — reference: nd.gaussian_filter, vpicdataset.py:363-369.
    * Each pass is ONE window over ghost-padded rows: a single shuffle,
    * fully inside whole-stage codegen.
    */
  def gaussianSmooth(df: DataFrame, value: String, sigma: Double,
      nz: Int, nx: Int, out: String): DataFrame =
    gaussianSmoothAxes(df, value, sigma, Seq("iz" -> nz, "ix" -> nx), out)

  /** Separable n-d Gaussian smoothing over an arbitrary index-dimension
    * list (the reference's z,y,x model at full rank, vpicdataset.py:
    * 197-204): one ghost-padded window pass per dimension, partitioned
    * by `it` plus every OTHER dimension — d shuffles for a d-dim grid,
    * same per-pass shape the 2-D operator has. Separability makes the
    * dimension count a loop, not a new operator.
    */
  def gaussianSmoothAxes(df: DataFrame, value: String, sigma: Double,
      dims: Seq[(String, Int)], out: String): DataFrame =
    gaussianSmoothAxesMulti(df, Seq(value -> out), sigma, dims)

  /** [[gaussianSmoothAxes]] over SEVERAL value columns in the same
    * separable passes: each per-dimension window carries every field, so
    * smoothing d fields costs the same d shuffles as smoothing one —
    * vs d separate smooths plus a (d-1)-way join to recombine them. At
    * the 100 TB design point that is one read of the grid instead of d.
    * Per-column expressions are identical to the single-column path, so
    * results are bit-equal.
    */
  def gaussianSmoothAxesMulti(df: DataFrame, values: Seq[(String, String)],
      sigma: Double, dims: Seq[(String, Int)]): DataFrame = {
    requireAllIndexDims(df, dims.map(_._1))
    val kern = gaussianKernel(sigma)
    val r = kern.map(_._1).max
    val idx = "it" +: dims.map(_._1)
    def pass(src: DataFrame, dim: String, n: Int,
        io: Seq[(String, String)]): DataFrame = {
      val others = idx.filterNot(_ == dim)
      val w = Window.partitionBy(others.map(col): _*).orderBy(dim)
      def at(in: String, k: Int): Column =
        if (k == 0) col(in) else if (k < 0) lag(col(in), -k).over(w)
        else lead(col(in), k).over(w)
      io.foldLeft(withReflectGhosts(src, dim, n, r, r)) {
        case (acc, (in, o)) =>
          acc.withColumn(o,
            kern.map { case (k, wk) => at(in, k) * wk }.reduce(_ + _))
      }.filter(col(dim) >= 0 && col(dim) < n)
    }
    val stageNames: Seq[Seq[String]] = dims.indices.map { i =>
      values.indices.map { j =>
        if (i == dims.length - 1) values(j)._2 else s"tmp_${i}_$j" }
    }
    dims.zipWithIndex.foldLeft(
      df.select((idx.map(col) ++ values.map(v => col(v._1))): _*)) {
      case (acc, ((dim, n), i)) =>
        val ins = if (i == 0) values.map(_._1) else stageNames(i - 1)
        pass(acc.select((idx.map(col) ++ ins.map(col)): _*), dim, n,
          ins.zip(stageNames(i)))
    }.select((idx.map(col) ++ values.map(v => col(v._2))): _*)
  }

  /** One separable size-10 extremum pass along `dim` over ghost-padded
    * rows, as FRAME aggregations (`rowsBetween(-5, 4)`, scipy origin-0)
    * on a single window: one shuffle, one sort, all output columns in
    * one pass — measurably cheaper than 10 lag/lead exprs + greatest.
    */
  private def extremumPass(src: DataFrame, dim: String, n: Int,
      others: Seq[String], aggs: Seq[(String, String, Boolean)]): DataFrame = {
    val w = Window.partitionBy(others.map(col): _*).orderBy(dim)
      .rowsBetween(-5, 4)
    val withOuts = aggs.foldLeft(withReflectGhosts(src, dim, n, 5, 4)) {
      case (acc, (in, o, isMax)) =>
        acc.withColumn(o,
          (if (isMax) max(col(in)) else min(col(in))).over(w))
    }
    withOuts.filter(col(dim) >= 0 && col(dim) < n)
  }

  /** Separable rectangular max/min filter, size 10 -> offsets -5..+4
    * (scipy origin-0 window), reflect boundary — reference:
    * nd.maximum_filter/minimum_filter size=10, vpicdataset.py:484-485.
    * One ghost-padded window per pass (two shuffles total).
    */
  def extremumFilter(df: DataFrame, value: String, nz: Int, nx: Int,
      isMax: Boolean, out: String): DataFrame =
    extremumFilterAxes(df, value, Seq("iz" -> nz, "ix" -> nx), isMax, out)

  /** n-d separable extremum filter: one ghost-padded window pass per
    * dimension in `dims`, d shuffles total.
    */
  def extremumFilterAxes(df: DataFrame, value: String,
      dims: Seq[(String, Int)], isMax: Boolean, out: String): DataFrame = {
    requireAllIndexDims(df, dims.map(_._1))
    val idx = "it" +: dims.map(_._1)
    val names = dims.indices.map(i =>
      if (i == dims.length - 1) out else s"tmp_$i")
    dims.zipWithIndex.foldLeft(df.select((idx :+ value).map(col): _*)) {
      case (acc, ((dim, n), i)) =>
        val in = if (i == 0) value else names(i - 1)
        extremumPass(acc.select((idx :+ in).map(col): _*), dim, n,
          idx.filterNot(_ == dim), Seq((in, names(i), isMax)))
    }.select((idx :+ out).map(col): _*)
  }

  /** Max AND min filter (size 10, offsets -5..+4, reflect) in one
    * ghost-padded window per pass: a single shuffle computes both, vs
    * four join+agg shuffle pairs for two extremumFilter calls.
    */
  def minmaxFilter(df: DataFrame, value: String, nz: Int, nx: Int,
      outMax: String, outMin: String): DataFrame = {
    requireAllIndexDims(df, Seq("iz", "ix"))
    val zp = extremumPass(df.select("it", "iz", "ix", value), "iz", nz,
      Seq("it", "ix"), Seq((value, "zmax", true), (value, "zmin", false)))
      .select("it", "iz", "ix", "zmax", "zmin")
    extremumPass(zp, "ix", nx, Seq("it", "iz"),
      Seq(("zmax", outMax, true), ("zmin", outMin, false)))
      .select("it", "iz", "ix", outMax, outMin)
  }

  /** gap_fill (reference vpicdataset.py:71-113): fill a pixel when opposing
    * neighbor patterns bracket it; np.roll => toroidal wraparound. Scatter
    * each cell's mask to its 8 neighbors (modular indices) + itself, then
    * one aggregation evaluates the bracket patterns. Output int 0/1.
    *
    * The reference defines this operator on 2-D (z,x) planes only; on a
    * 3-D grid it applies per plane — pass `keys = Seq("it", "iy")` and
    * every y slice fills independently in the same single shuffle.
    */
  def gapFill(df: DataFrame, mask: String, nz: Int, nx: Int,
      out: String, keys: Seq[String] = Seq("it")): DataFrame = {
    // (oi, oj): source offset relative to the receiving cell.
    val dirs = Seq(
      ("C", 0, 0), ("U", -1, 0), ("D", 1, 0), ("L", 0, -1), ("R", 0, 1),
      ("UL", -1, -1), ("UR", -1, 1), ("DL", 1, -1), ("DR", 1, 1))
    val offArr = array(dirs.map { case (nm, oi, oj) =>
      struct(lit(nm).as("dir"), lit(oi).as("oi"), lit(oj).as("oj"))
    }: _*)
    val k = keys.map(col)
    val scattered = df.select((k :+ col("iz") :+ col("ix")
        :+ col(mask).cast("int").as("m") :+ explode(offArr).as("o")): _*)
      .select((k :+ ((col("iz") - col("o.oi") + nz) % nz).as("iz")
        :+ ((col("ix") - col("o.oj") + nx) % nx).as("ix")
        :+ col("o.dir").as("dir") :+ col("m")): _*)
    def dcol(nm: String): Column =
      max(when(col("dir") === nm, col("m")).otherwise(0))
    val nbr = scattered.groupBy((k :+ col("iz") :+ col("ix")): _*)
      .agg(dcol("C").as("c"), dcol("U").as("u"), dcol("D").as("d"),
        dcol("L").as("l"), dcol("R").as("r"), dcol("UL").as("ul"),
        dcol("UR").as("ur"), dcol("DL").as("dl"), dcol("DR").as("dr"))
    nbr.withColumn(out,
      (col("c") === 1
        || (col("l") === 1 && (col("ur") === 1 || col("r") === 1 || col("dr") === 1))
        || (col("r") === 1 && (col("ul") === 1 || col("l") === 1 || col("dl") === 1))
        || (col("u") === 1 && (col("dl") === 1 || col("d") === 1 || col("dr") === 1))
        || (col("d") === 1 && (col("ul") === 1 || col("u") === 1 || col("ur") === 1))
        || (col("ul") === 1 && col("dr") === 1)
        || (col("ur") === 1 && col("dl") === 1)).cast("int"))
      .select(keys.head, (keys.tail ++ Seq("iz", "ix", out)): _*)
  }
}
