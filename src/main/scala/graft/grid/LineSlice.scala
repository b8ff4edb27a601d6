package graft.grid

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interpolating 1-D line slice of a grid variable — reference
  * `_spaceslice` (/root/reference/src/variables/statmeshvar.py:111-200),
  * with its quirks preserved:
  *  - parameter step = grid spacing of the axis the line is MOST aligned
  *    with via signed argmax (statmeshvar.py:159-161 — np.argmax on the
  *    signed unit vector, not |components|);
  *  - parameter range clipped to the mesh box by per-axis ray entry/exit
  *    (:166-183), then shrunk by dx/3 at each end "to avoid nans" (:184-185);
  *  - sample parameters = arange(min_s, max_s, dx) (:187);
  *  - 'linear' and 'nearest' only, anything else is an error (:130-143);
  *  - degenerate (length<=1) axes rejected (:133-140).
  *
  * Execution is Spark-shaped: the (small) sample/corner table is built
  * driver-side from the (small) axes, then ONE equi-join against the
  * distributed long-format data + a groupBy computes all samples for all
  * time steps at once — the reference's per-sample Python loop (:189-190)
  * becomes a single distributed join.
  */
object LineSlice {
  /** Reference `uniform` (vpicdataset.py:18-22): allclose(diff, diff[0]). */
  def uniform(axis: Array[Double], atol: Double = 1e-3): Boolean = {
    if (axis.length < 2) return true
    val d0 = axis(1) - axis(0)
    axis.sliding(2).forall { case Array(a, b) => math.abs((b - a) - d0) <= atol }
  }

  /** One sample row: corner indices and weight for one corner of one
    * sample point.
    */
  final case class Corner(sampleIdx: Int, s: Double, w: Double,
      idxs: Seq[Int])

  /** Driver-side sampling geometry (pure function of the axes + line):
    * shared by the Spark execution and by oracle-SQL generation.
    */
  def sampleCorners(axes: Seq[Array[Double]], setPts: Seq[Array[Double]],
      interp: String): Seq[Corner] = {
    require(setPts.length == 2,
      "slices in more than 1d are not currently supported") // :192-196
    require(interp == "linear" || interp == "nearest",
      s"Specified interpolation type $interp is not currently implemented")
    require(axes.forall(_.length > 1),
      "This interpolation method cannot handle degenerate dimensions")
    val ndim = axes.length
    val p0 = setPts.head; val p1 = setPts(1)
    require(p0.length == ndim && p1.length == ndim)

    val vec = p1.zip(p0).map { case (b, a) => b - a }
    val norm = math.sqrt(vec.map(x => x * x).sum)
    val unitVec = vec.map(_ / norm)
    val baseDir = unitVec.indexOf(unitVec.max) // signed argmax (quirk)
    val dx = axes(baseDir)(1) - axes(baseDir)(0)

    var minS = Double.NegativeInfinity
    var maxS = Double.PositiveInfinity
    for (dim <- 0 until ndim) {
      val dir = math.signum(unitVec(dim))
      if (dir != 0) {
        val (lo, hi) =
          if (dir > 0)
            ((axes(dim).head - p0(dim)) / unitVec(dim),
              (axes(dim).last - p0(dim)) / unitVec(dim))
          else
            ((axes(dim).last - p0(dim)) / unitVec(dim),
              (axes(dim).head - p0(dim)) / unitVec(dim))
        minS = math.max(minS, lo)
        maxS = math.min(maxS, hi)
      }
    }
    minS += dx / 3 // :184-185
    maxS -= dx / 3
    val sParams = Iterator.iterate(minS)(_ + dx).takeWhile(_ < maxS).toArray

    // bracketing index + fraction per (sample, dim); axes may be
    // non-uniform (physical-coordinate interpolation like
    // RegularGridInterpolator).
    def bracket(axis: Array[Double], pos: Double): (Int, Double) = {
      val j = java.util.Arrays.binarySearch(axis, pos)
      if (j >= 0) (math.min(j, axis.length - 2),
        if (j >= axis.length - 1) 1.0 else 0.0)
      else {
        val ins = -j - 1
        val i0 = math.min(math.max(ins - 1, 0), axis.length - 2)
        (i0, (pos - axis(i0)) / (axis(i0 + 1) - axis(i0)))
      }
    }

    sParams.zipWithIndex.flatMap { case (s, si) =>
      val brackets = (0 until ndim).map { dim =>
        bracket(axes(dim), p0(dim) + s * unitVec(dim))
      }
      if (interp == "nearest") {
        val idxs = brackets.map { case (i0, f) => if (f > 0.5) i0 + 1 else i0 }
        Seq(Corner(si, s, 1.0, idxs))
      } else {
        // 2^ndim corners, weight = product of per-dim linear weights
        (0 until (1 << ndim)).map { mask =>
          var w = 1.0
          val idxs = (0 until ndim).map { dim =>
            val (i0, f) = brackets(dim)
            val hi = ((mask >> dim) & 1) == 1
            w *= (if (hi) f else 1.0 - f)
            if (hi) i0 + 1 else i0
          }
          Corner(si, s, w, idxs)
        }.filter(_.w != 0.0)
      }
    }.toSeq
  }

  def slice(v: GridVar, setPts: Seq[Array[Double]],
      interp: String = "linear"): GridVar = {
    val axes = v.spaceAxes.map(_._2)
    val corners = sampleCorners(axes, setPts, interp)
    val sParams = corners.map(c => c.sampleIdx -> c.s).distinct
      .sortBy(_._1).map(_._2).toArray

    val spark = v.df.sparkSession
    val idxCols = v.spaceAxes.map(_._1)
    val schema = StructType(
      StructField("i0", IntegerType) :: StructField("s", DoubleType) ::
        StructField("w", DoubleType) ::
        idxCols.map(c => StructField(s"c_$c", IntegerType)).toList)
    val cornerDf = spark.createDataFrame(
      spark.sparkContext.parallelize(corners.map(c =>
        Row.fromSeq(c.sampleIdx :: c.s :: c.w :: c.idxs.toList)), 1),
      schema)

    val joinCond = idxCols.map(c => col(c) === col(s"c_$c")).reduce(_ && _)
    val sliced = v.df.join(broadcast(cornerDf), joinCond)
      .groupBy(col("it"), col("t"), col("i0"), col("s"))
      .agg(sum(col("w") * col("value")).as("value"))

    GridVar(v.label, v.timeAxis, Seq(("i0", sParams)), sliced)
  }

  /** Spacetime slice along a MOVING measure point — the spacecraft-path
    * sampler the reference names as a TODO (statmeshvar.py:8-10) and
    * reserves `DynMeshVar` for (dynmeshvar.py:9-35, constructor raises).
    * Given a static-mesh variable and a probe `path` — one row per
    * sample with a time index `it` plus one PHYSICAL coordinate column
    * per spatial dim (named like the variable's coordinate columns, e.g.
    * z, x) — interpolate the field at the probe's position AT THE
    * PROBE'S OWN TIME. Unlike [[slice]], whose sampling geometry is a
    * driver-side constant, here the sample positions are DATA (the path
    * may be a billion-row trajectory), so bracketing runs distributed:
    *
    *  - per-dim bracket index/fraction against the BROADCAST tiny axis
    *    arrays, as codegen'd higher-order-function arithmetic
    *    (`size(filter(axis <= p))` = searchsorted — identical semantics
    *    to [[sampleCorners]]' binary-search bracket, incl. clamping to
    *    the edge bracket, i.e. linear extrapolation out of bounds);
    *  - 2^ndim corner explosion ('linear') or the single rounded corner
    *    ('nearest'), zero-weight corners dropped like sampleCorners;
    *  - ONE equi-join on (it, grid indices) + groupBy — time-dependent
    *    by construction, so each path row meets only its own timestep's
    *    cells. At scale both sides shuffle hash-partitioned on the join
    *    key (AQE broadcasts whichever side is small); nothing is ever
    *    driver-side materialized.
    *
    * Returns a [[DynVar]] with the path's columns plus the sampled
    * `value` — a moving-measure-point variable, closing the reference's
    * StatMeshVar -> (spacetime slice) -> DynMeshVar arc.
    *
    * With `timeInterp = true` the slice interpolates in TIME as well —
    * the path carries physical `t` (no `it`), time brackets against the
    * variable's timeAxis like any spatial axis, and each sample blends
    * the 2^(ndim+1) surrounding spacetime corners. This is the fully
    * continuous spacecraft model: probes sample between simulation
    * outputs, not only on them.
    *
    * Boundary semantics: SPATIAL out-of-range positions clamp to the
    * edge bracket and extrapolate linearly (sampleCorners' contract).
    * TIME depends on the mode: in index mode (timeInterp = false) an
    * `it` with no grid rows produces NO output row (relational
    * semantics of the inner corner join — there is no field to sample,
    * and inventing one by clamping a time INDEX would fabricate data);
    * with timeInterp = true, time IS an interpolation axis and behaves
    * exactly like the spatial ones — out-of-range t clamps to the edge
    * time bracket and extrapolates. Rows with a null coordinate drop.
    * A sample whose corners are only PARTIALLY present in the grid (a
    * sparse grid violating the dense-GridVar invariant every grid
    * operator here assumes) is dropped rather than emitted as a
    * silently scaled partial sum — the weight-sum identity
    * Σw = 1 (which holds for interpolation AND extrapolation) is
    * checked per sample. Callers needing to detect lost samples
    * compare output to input cardinality.
    */
  def pathSlice(v: GridVar, path: DataFrame, interp: String = "linear",
      timeInterp: Boolean = false): DynVar = {
    require(interp == "linear" || interp == "nearest",
      s"Specified interpolation type $interp is not currently implemented")
    require(v.spaceAxes.forall(_._2.length > 1),
      "This interpolation method cannot handle degenerate dimensions")
    require(!path.columns.contains("value"),
      "path must not carry a 'value' column — pathSlice appends the sampled value")
    require(!path.columns.exists(_.startsWith("__")),
      "path columns must not start with '__' — reserved for pathSlice internals")
    if (timeInterp) {
      require(v.timeAxis.length > 1,
        "time interpolation needs a time axis with more than one sample")
      require(path.columns.contains("t") && !path.columns.contains("it"),
        "a time-interpolating path carries physical 't', not index 'it'")
    }
    // strictly increasing axes: duplicate adjacent knots would zero a
    // bracket denominator and silently DROP the sample through the
    // weight-sum filter — refuse up front (the dense-GridVar invariant
    // the interpolation already assumes)
    (v.spaceAxes.map { case (idx, a) => (v.coordCol(idx), a) } ++
        (if (timeInterp) Seq(("t", v.timeAxis)) else Nil))
      .foreach { case (name, a) =>
        require(a.indices.drop(1).forall(j => a(j - 1) < a(j)),
          s"axis '$name' must be strictly increasing (duplicate or " +
            "unsorted knots make bracket weights undefined)")
      }
    // bracketed dimensions: (join/index column, axis, path column).
    // With timeInterp the TIME axis is just one more bracketed dim —
    // the corner set doubles (2^(ndim+1)) and each sample blends the
    // two surrounding timesteps, the full "spacetime-slice" of the
    // reference's TODO; without it, `it` must match a grid timestep
    // exactly (the corner join below pins it).
    val dims: Seq[(String, Array[Double], String)] =
      (if (timeInterp) Seq(("it", v.timeAxis, "t")) else Nil) ++
        v.spaceAxes.map { case (idx, a) => (idx, a, v.coordCol(idx)) }
    val pathCols = path.columns.toSeq
    // unique per-row key so DUPLICATE path rows (a stationary probe
    // sampled twice at one timestep) each produce their own output row
    // instead of being collapsed into one group whose corner sum
    // silently doubles the field value. The id is internal only —
    // grouped on, never emitted.
    val keyed = path.withColumn("__pid", monotonically_increasing_id())

    // per-dim bracket: insertion point via count(axis <= p), then the
    // clamped lower index + linear fraction (exactly sampleCorners'
    // bracket: on-knot hits give f=0, last-knot gives f=1, out-of-range
    // clamps to the edge bracket with f outside [0,1] = extrapolation)
    var df = keyed
    dims.foreach { case (idx, axis, pcol) =>
      val p = col(pcol)
      val axisLit = typedLit(axis.toSeq)
      val ins = size(filter(axisLit, a => a <= p))
      df = df
        .withColumn(s"__i0_$idx",
          least(greatest(ins - 1, lit(0)), lit(axis.length - 2)))
        .withColumn(s"__f_$idx",
          (p - element_at(axisLit, col(s"__i0_$idx") + 1)) /
            (element_at(axisLit, col(s"__i0_$idx") + 2) -
              element_at(axisLit, col(s"__i0_$idx") + 1)))
    }

    val nd = dims.length
    val cornered =
      if (interp == "nearest") {
        dims.foldLeft(df) { case (d, (idx, _, _)) =>
          d.withColumn(s"__c_$idx",
            when(col(s"__f_$idx") > 0.5, col(s"__i0_$idx") + 1)
              .otherwise(col(s"__i0_$idx")))
        }.withColumn("__w", lit(1.0))
      } else {
        // 2^nd corners; weight = product of per-dim linear weights in
        // dim order — time (when interpolated) first, then the axes in
        // mesh order, matching sampleCorners' accumulation bit-for-bit
        val cornerStructs = array((0 until (1 << nd)).map { m =>
          struct((0 until nd).map(dim =>
            lit(((m >> dim) & 1) == 1).as(s"h$dim")): _*)
        }: _*)
        var d = df.withColumn("__c", explode(cornerStructs))
        var w: Column = lit(1.0)
        dims.zipWithIndex.foreach { case ((idx, _, _), dim) =>
          val hi = col(s"__c.h$dim")
          d = d.withColumn(s"__c_$idx",
            when(hi, col(s"__i0_$idx") + 1).otherwise(col(s"__i0_$idx")))
          w = w * when(hi, col(s"__f_$idx")).otherwise(lit(1.0) - col(s"__f_$idx"))
        }
        d.withColumn("__w", w).filter(col("__w") =!= 0.0)
      }

    val idxCols = v.spaceAxes.map(_._1)
    val gdf = v.df.select(
      (("it" +: idxCols).map(c => col(c).as(s"__g_$c")) :+ col("value")): _*)
    val timeCond =
      if (timeInterp) col("__c_it") === col("__g_it")
      else col("it") === col("__g_it")
    val joinCond = timeCond +: idxCols.map(c =>
      col(s"__c_$c") === col(s"__g_$c"))
    val joined = cornered.join(gdf, joinCond.reduce(_ && _))
    // Σw = 1 guards against a sparse grid: if some corners of a sample
    // found no grid row (missing timestep/cell), the partial sum would
    // silently scale the field by the surviving weight mass — drop the
    // sample instead, matching the no-data-no-row contract. Zero-weight
    // corners were filtered above but contribute nothing to Σw anyway.
    val out = joined.groupBy((col("__pid") +: pathCols.map(col)): _*)
      .agg(sum(col("__w") * col("value")).as("value"),
        sum(col("__w")).as("__wsum"))
      .filter(abs(col("__wsum") - 1.0) < 1e-6)
      .drop("__pid", "__wsum")
    DynVar(v.label, out)
  }
}
