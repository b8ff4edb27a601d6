package graft.sources

import java.io.{BufferedInputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 ingest for a VPIC-style simulation output tree — the one
  * declared reference entry point with no parquet counterpart
  * (`pyvpic.open`, /root/reference/src/datasets/vpicdataset.py:194).
  *
  * Three on-disk layouts behind one scan:
  *   - REAL HDF5 ([[Hdf5File]]): a genuine HDF5 container written and
  *     validated by the pure-JVM [[Hdf5]] codec (no HDF5 library in
  *     this environment — the format is implemented from the public
  *     spec, the same play that retired the media-codec adjudication);
  *     variables are 4-D contiguous f64 datasets, axes live in the
  *     container under `grid/`.
  *   - per-variable raw tree: a directory per dataset path (e.g.
  *     `fields/ex/`) holding a raw big-endian array file `data.bin`
  *     (header nt,nz,ny,nx then row-major doubles), plus an
  *     `info.json` sidecar carrying the timeseries and mesh axes
  *     (`reader.get_grid`, vpicdataset.py:197).
  *   - band-interleaved raw file ([[InterleavedFile]]).
  *
  * The Spark-side plumbing is real DSv2:
  *   - one InputPartition per (variable, time-chunk): a 1000-executor
  *     cluster reads a 100 TB dump with per-chunk parallelism and each
  *     reader seeks directly to its chunk;
  *   - column pruning (SupportsPushDownRequiredColumns) reaches the
  *     reader — a `select(value)` never materializes the index columns;
  *   - `var` equality/IN and `it` range filters prune whole files and
  *     chunks at planning time (the time-slice + get_vars projection
  *     story of the reference, executed as scan pruning).
  */
object VPICSource {
  /** Full z,y,x data plane (the reference's axis order, "DEFAULT LABEL
    * FOR EACH SPATIAL DIMENSION GOES Z,Y,X", vpicdataset.py:130-131): a
    * 2-D run is simply a tree whose y axis is a singleton — degenerate
    * axes are squeezed from the MESH at load ([[loadDataset]]), while
    * index columns stay in the rows (they cost nothing under column
    * pruning and keep the schema stable across runs).
    */
  val Schema: StructType = StructType(Seq(
    StructField("var", StringType, nullable = false),
    StructField("it", IntegerType, nullable = false),
    StructField("iz", IntegerType, nullable = false),
    StructField("iy", IntegerType, nullable = false),
    StructField("ix", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val DataFile = "data.bin"
  val InfoFile = "info.json"
  /** data.bin header: nt, nz, ny, nx as big-endian ints. */
  val HeaderBytes = 16

  /** Band-INTERLEAVED single-file layout (the reference's
    * `interleave=True` reader mode, vpicdataset.py:171-183 via
    * pyvpic.open: one file carries every variable, values of ALL
    * variables adjacent per grid point — array-of-structs — instead of
    * one contiguous block per variable). Same 16-byte header; the
    * variable list and its on-disk band order live in info.json as
    * `ivars`.
    */
  val InterleavedFile = "interleaved.bin"

  /** REAL HDF5 single-file layout (the format `pyvpic.open` actually
    * ingests, vpicdataset.py:194) — a genuine HDF5 container written
    * and validated by the pure-JVM [[Hdf5]] codec: every variable is a
    * 4-D (nt, nz, ny, nx) contiguous f64 dataset at its tree path, and
    * the grid lives IN the container as 1-D datasets `grid/time`,
    * `grid/z`, `grid/y`, `grid/x` (no info.json sidecar — real dumps
    * carry their coordinates). The scan seeks straight into a
    * dataset's contiguous block per (variable, time-chunk), so a
    * 1000-executor cluster reads only the chunks it owns.
    */
  val Hdf5File = "data.h5"
  private val GridGroup = "grid/"

  /** Write a REAL HDF5 VPIC tree (the [[Hdf5]] subset): axes under
    * `grid/`, each variable a 4-D dataset. `littleEndian` selects the
    * float byte order — HPC dumps ship both, and the scan handles both.
    *
    * `chunkTime = Some(ct)` switches to the layout real h5py/VPIC
    * dumps actually use: variables CHUNKED (ct, nz, ny, nx) — one
    * spatial slab per ct time steps — and the tiny axis datasets
    * chunked too (exercising the driver-side chunked read); `gzip`
    * deflates each chunk; `f32` stores variables as binary32 (axes
    * stay f64 — coordinates keep full precision).
    */
  def writeHdf5Tree(dir: String, time: Array[Double],
      zAxis: Array[Double], yAxis: Array[Double], xAxis: Array[Double],
      vars: Map[String, (Int, Int, Int, Int) => Double],
      littleEndian: Boolean = false, chunkTime: Option[Int] = None,
      gzip: Boolean = false, f32: Boolean = false,
      shuffle: Boolean = false,
      tweak: Hdf5.H5Write => Hdf5.H5Write = identity): Unit = {
    require((!gzip && !shuffle) || chunkTime.isDefined,
      "VPIC HDF5: gzip/shuffle requires a chunked tree (chunkTime)")
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val nt = time.length; val nz = zAxis.length
    val ny = yAxis.length; val nx = xAxis.length
    def axisChunk(n: Int): Option[Array[Long]] =
      chunkTime.map(_ => Array(math.max(1L, (n + 1) / 2)))
    val axes = Seq(("grid/time", time), ("grid/z", zAxis),
      ("grid/y", yAxis), ("grid/x", xAxis)).map { case (p, a) =>
      Hdf5.H5Write(p, Array(a.length.toLong), a,
        chunkDims = axisChunk(a.length), gzip = gzip, shuffle = shuffle)
    }
    val varSpecs = vars.toSeq.sortBy(_._1).map { case (path, f) =>
      val data = new Array[Double](nt * nz * ny * nx)
      var i = 0
      for (it <- 0 until nt; iz <- 0 until nz;
           iy <- 0 until ny; ix <- 0 until nx) {
        data(i) = f(it, iz, iy, ix); i += 1
      }
      tweak(Hdf5.H5Write(path,
        Array(nt.toLong, nz.toLong, ny.toLong, nx.toLong),
        data, chunkDims = chunkTime.map(ct =>
          Array(math.min(ct, nt).toLong, nz.toLong, ny.toLong, nx.toLong)),
        gzip = gzip, f32 = f32, shuffle = shuffle))
    }
    Hdf5.writeSpecs(root.resolve(Hdf5File).toString, axes ++ varSpecs,
      littleEndian)
  }

  /** The HDF5 tree's dataset index, or empty when the tree is not an
    * HDF5 one. Metadata-only parse (addresses + dims), driver-side.
    */
  def hdf5Index(root: String): Seq[Hdf5.H5Dataset] = {
    val p = Paths.get(root, Hdf5File)
    if (!Files.isRegularFile(p)) Seq.empty
    else Hdf5.index(p.toString)
  }

  /** Variable list of an HDF5 tree: every non-`grid/` dataset, which
    * must be rank-4 (nt, nz, ny, nx) — anything else is a malformed
    * tree, rejected with the offending path named.
    */
  def hdf5Vars(idx: Seq[Hdf5.H5Dataset]): Seq[(String, String)] =
    requireUniqueLeaves(idx.filterNot(_.path.startsWith(GridGroup))
      .map { d =>
        require(d.dims.length == 4,
          s"VPIC HDF5: variable ${d.path} has rank ${d.dims.length}" +
            " (need 4: nt, nz, ny, nx)")
        (d.path, d.path.split('/').last)
      })

  /** Write a mock VPIC tree: `vars` maps dataset paths ("fields/ex") to
    * value generators f(it, iz, iy, ix). Dev/test producer for the
    * reader. Layout is row-major in z,y,x order (time outermost), the
    * reference's data order.
    */
  def writeMock(dir: String, time: Array[Double], zAxis: Array[Double],
      yAxis: Array[Double], xAxis: Array[Double],
      vars: Map[String, (Int, Int, Int, Int) => Double]): Unit = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val axes =
      s"""{"time":${time.mkString("[", ",", "]")},
         |"axes":{"iz":${zAxis.mkString("[", ",", "]")},
         |"iy":${yAxis.mkString("[", ",", "]")},
         |"ix":${xAxis.mkString("[", ",", "]")}}}""".stripMargin
    Files.writeString(root.resolve(InfoFile), axes)
    vars.foreach { case (path, f) =>
      val vdir = root.resolve(path)
      Files.createDirectories(vdir)
      val out = new DataOutputStream(new java.io.BufferedOutputStream(
        new FileOutputStream(vdir.resolve(DataFile).toFile)))
      try {
        out.writeInt(time.length); out.writeInt(zAxis.length)
        out.writeInt(yAxis.length); out.writeInt(xAxis.length)
        for (it <- time.indices; iz <- zAxis.indices;
             iy <- yAxis.indices; ix <- xAxis.indices)
          out.writeDouble(f(it, iz, iy, ix))
      } finally out.close()
    }
  }

  /** 2-D convenience producer (singleton y axis). */
  def writeMock2d(dir: String, time: Array[Double], zAxis: Array[Double],
      xAxis: Array[Double], vars: Map[String, (Int, Int, Int) => Double]): Unit =
    writeMock(dir, time, zAxis, Array(0.0), xAxis,
      vars.map { case (p, f) =>
        p -> ((it: Int, iz: Int, _: Int, ix: Int) => f(it, iz, ix))
      })

  /** Mock producer for the INTERLEAVED layout: one `interleaved.bin`
    * at the tree root, cells in the same t,z,y,x row-major order, and
    * within each cell one value per variable in `vars` order (the band
    * order recorded as `ivars` in info.json).
    */
  def writeMockInterleaved(dir: String, time: Array[Double],
      zAxis: Array[Double], yAxis: Array[Double], xAxis: Array[Double],
      vars: Seq[(String, (Int, Int, Int, Int) => Double)]): Unit = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val info =
      s"""{"time":${time.mkString("[", ",", "]")},
         |"axes":{"iz":${zAxis.mkString("[", ",", "]")},
         |"iy":${yAxis.mkString("[", ",", "]")},
         |"ix":${xAxis.mkString("[", ",", "]")}},
         |"ivars":${vars.map("\"" + _._1 + "\"").mkString("[", ",", "]")}}""".stripMargin
    Files.writeString(root.resolve(InfoFile), info)
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(root.resolve(InterleavedFile).toFile)))
    try {
      out.writeInt(time.length); out.writeInt(zAxis.length)
      out.writeInt(yAxis.length); out.writeInt(xAxis.length)
      for (it <- time.indices; iz <- zAxis.indices;
           iy <- yAxis.indices; ix <- xAxis.indices; (_, f) <- vars)
        out.writeDouble(f(it, iz, iy, ix))
    } finally out.close()
  }

  /** The interleaved tree's variable list in BAND ORDER (path, leaf),
    * from info.json `ivars`; empty when the tree is not interleaved.
    */
  def interleavedVars(root: String): Seq[(String, String)] = {
    val ip = Paths.get(root, InfoFile)
    if (!Files.isRegularFile(Paths.get(root, InterleavedFile))
      || !Files.isRegularFile(ip)) return Seq.empty
    val info = graft.grid.ujsonLite.parse(Files.readString(ip))
    val paths = info.obj.get("ivars").map(_.arr.map(_.str)).getOrElse(Vector.empty)
    requireUniqueLeaves(paths.map(p => (p, p.split('/').last)))
  }

  /** All dataset paths under root (dirs containing data.bin), sorted —
    * the reader.datasets listing (vpicdataset.py:196).
    */
  def listVars(root: String): Seq[(String, String)] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return Seq.empty
    val h5 = hdf5Index(root)
    if (h5.nonEmpty) return hdf5Vars(h5)
    val found = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def walk(p: Path): Unit = {
      if (Files.isRegularFile(p.resolve(DataFile)))
        found += ((p.toString, p.getFileName.toString))
      val st = Files.list(p) // close the dir stream: it holds an fd
      val subdirs =
        try st.iterator().asScala.filter(Files.isDirectory(_)).toSeq
        finally st.close()
      subdirs.sortBy(_.toString).foreach(walk)
    }
    walk(r)
    requireUniqueLeaves(found.sortBy(_._1).toSeq)
  }

  /** Rows and the SimDataset variable map key on the LEAF name, so two
    * dataset paths with the same leaf (fields/ex vs hydro2/ex) would
    * silently shadow each other downstream — reject them with the
    * colliding paths named, rather than return ambiguous labels.
    */
  private def requireUniqueLeaves(
      vars: Seq[(String, String)]): Seq[(String, String)] = {
    val dups = vars.groupBy(_._2).filter(_._2.length > 1)
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        "duplicate VPIC dataset leaf names (labels must be unique): " +
          dups.map { case (l, ps) =>
            s"$l <- ${ps.map(_._1).mkString(", ")}" }.mkString("; "))
    vars
  }

  /** get_vars projection: case-sensitive substring, FIRST match wins per
    * requested pattern (vpicdataset.py:206-213 incl. the documented
    * substring edge cases). The 'all' sentinel is checked ONLY in the
    * head position, exactly like the reference's `get_vars[0] != 'all'`
    * (vpicdataset.py:206) — `Seq("all", "ne")` selects everything.
    */
  def selectLabels(all: Seq[(String, String)], patterns: Seq[String]): Seq[(String, String)] =
    if (patterns.isEmpty || patterns.head == "all") all
    else patterns.flatMap(p => all.find { case (path, _) => path.contains(p) }).distinct

  def readHeader(dir: String, file: String = DataFile): (Int, Int, Int, Int) = {
    val in = new DataInputStream(new FileInputStream(
      Paths.get(dir, file).toFile))
    try (in.readInt(), in.readInt(), in.readInt(), in.readInt())
    finally in.close()
  }

  /** Reconstruct a [[graft.grid.SimDataset]] from a VPIC tree — the
    * `_init_vpicfile` pipeline (vpicdataset.py:172-231): DSv2 scan per
    * selected variable, coordinate columns joined from the (tiny,
    * driver-side) axes, singleton mesh dims squeezed out of the axis
    * list (`default mesh takes only non-redundant dimensions`,
    * vpicdataset.py:199-203). `paramFile` feeds the key-value param
    * ingest ([[graft.grid.SimDataset.paramsFromFile]]).
    */
  def loadDataset(spark: SparkSession, dir: String,
      getVars: Seq[String] = Seq("all"),
      paramFile: Option[String] = None): graft.grid.SimDataset = {
    import graft.grid.{GridVar, SimDataset, ujsonLite}
    // axes: an HDF5 tree carries them IN the container (grid/ axis
    // datasets — tiny, read driver-side); the raw layouts keep their
    // info.json sidecar
    val h5 = hdf5Index(dir)
    val (time, axesAll) = if (h5.nonEmpty) {
      val byPath = h5.map(d => d.path -> d).toMap
      val h5Path = Paths.get(dir, Hdf5File).toString
      def axis(name: String): Array[Double] = {
        val d = byPath.getOrElse("grid/" + name,
          throw new IllegalArgumentException(
            s"VPIC HDF5: missing grid/$name axis dataset in $dir"))
        require(d.dims.length == 1,
          s"VPIC HDF5: grid/$name has rank ${d.dims.length} (need 1)")
        Hdf5.readDoubles(h5Path, d, 0, d.nElems.toInt)
      }
      (axis("time"),
        Seq("iz" -> axis("z"), "iy" -> axis("y"), "ix" -> axis("x")))
    } else {
      val info = ujsonLite.parse(
        Files.readString(Paths.get(dir, InfoFile)))
      (info.obj("time").arr.map(_.num).toArray,
        info.obj("axes").obj.map { case (n, v) =>
          (n, v.arr.map(_.num).toArray)
        }.toSeq)
    }
    // squeeze: singleton axes leave the mesh (indices stay in the rows)
    val axes = axesAll.filter(_._2.length > 1)
    val iv = interleavedVars(dir)
    val selected = selectLabels(if (iv.nonEmpty) iv else listVars(dir), getVars)
    val scan = spark.read.format("graft-vpic")
      .option("path", dir)
      .option("vars", getVars.mkString(","))
      .load()
    val vars = selected.map { case (_, label) =>
      var df = scan.filter(col("var") === label).drop("var")
        .withColumn("t", element_at(typedlit(time), col("it") + 1))
      axes.foreach { case (idx, axis) =>
        df = df.withColumn(idx.stripPrefix("i"),
          element_at(typedlit(axis), col(idx) + 1))
      }
      label -> GridVar(label, time, axes, df)
    }.toMap
    val params = paramFile.map(SimDataset.paramsFromFile).getOrElse(Map.empty)
    SimDataset(params, vars)
  }
}

class VPICTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-vpic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VPICSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new VPICTable(properties.get("path"))
}

private[sources] class VPICTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"vpic($root)"
  override def schema(): StructType = VPICSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  // options parsed here, not in getTable: the scan-time
  // CaseInsensitiveStringMap is the one canonical carrier of reader opts
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VPICScanBuilder(root,
      Option(options.get("vars")).map(_.split(',').toSeq).getOrElse(Seq("all")),
      options.getInt("chunkSteps", 4))
}

private[sources] class VPICScanBuilder(root: String, vars: Seq[String], chunkSteps: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = VPICSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept var-equality and it-range filters for PARTITION pruning, but
    * return everything as post-scan filters: Spark re-applies them, so a
    * conservative pruner can never drop correctness.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("var", _) | In("var", _) => true
      case EqualTo("it", _) | GreaterThan("it", _) | GreaterThanOrEqual("it", _)
           | LessThan("it", _) | LessThanOrEqual("it", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new VPICScan(root, vars, chunkSteps, required, pushed)
}

private[sources] class VPICScan(root: String, vars: Seq[String], chunkSteps: Int,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"vpic scan of $root, vars=${vars.mkString("/")}, pushed=${pushed.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    // layout detection: an interleaved tree declares its band order in
    // info.json and carries one shared file; an HDF5 tree carries one
    // real container whose dataset index yields dims + data addresses;
    // band indices come from the FULL list even when pruning selects a
    // subset
    val ivars = VPICSource.interleavedVars(root)
    val interleaved = ivars.nonEmpty
    val bandOf = ivars.map(_._1).zipWithIndex.toMap
    val h5 = if (interleaved) Seq.empty else VPICSource.hdf5Index(root)
    val h5ByPath = h5.map(d => d.path -> d).toMap
    // file-level pruning: get_vars projection, then pushed var filters
    var labels = VPICSource.selectLabels(
      if (interleaved) ivars
      else if (h5.nonEmpty) VPICSource.hdf5Vars(h5)
      else VPICSource.listVars(root), vars)
    pushed.foreach {
      case EqualTo("var", v: String) => labels = labels.filter(_._2 == v)
      case In("var", vs) =>
        val set = vs.collect { case s: String => s }.toSet
        labels = labels.filter(l => set.contains(l._2))
      case _ => ()
    }
    // chunk-level pruning: pushed it bounds
    var itLo = 0; var itHi = Int.MaxValue
    def long(a: Any): Int = a match {
      case i: Int => i; case l: Long => l.toInt; case _ => Int.MaxValue
    }
    pushed.foreach {
      case EqualTo("it", v) => itLo = math.max(itLo, long(v)); itHi = math.min(itHi, long(v))
      case GreaterThan("it", v) => itLo = math.max(itLo, long(v) + 1)
      case GreaterThanOrEqual("it", v) => itLo = math.max(itLo, long(v))
      case LessThan("it", v) => itHi = math.min(itHi, long(v) - 1)
      case LessThanOrEqual("it", v) => itHi = math.min(itHi, long(v))
      case _ => ()
    }
    // one shared header for the whole interleaved file — read once, not
    // once per selected band
    lazy val sharedHeader =
      VPICSource.readHeader(root, VPICSource.InterleavedFile)
    labels.flatMap { case (path, label) =>
      if (interleaved) {
        val (nt, nz, ny, nx) = sharedHeader
        val lo = math.max(0, itLo); val hi = math.min(nt - 1, itHi)
        (lo to hi by chunkSteps).map { t0 =>
          VPICInputPartition(root, label, t0,
            math.min(t0 + chunkSteps - 1, hi), nz, ny, nx,
            file = VPICSource.InterleavedFile,
            nvars = ivars.length, vidx = bandOf(path))
        }
      } else if (h5.nonEmpty) {
        // HDF5: dims + data/chunk addresses come from the parsed index
        val d = h5ByPath(path)
        val Array(ntL, nzL, nyL, nxL) = d.dims
        val (nt, nz, ny, nx) = (ntL.toInt, nzL.toInt, nyL.toInt, nxL.toInt)
        val lo = math.max(0, itLo); val hi = math.min(nt - 1, itHi)
        d.layout match {
          case Hdf5.H5Compact(_) => throw new IllegalArgumentException(
            s"VPIC HDF5: variable $label has a COMPACT layout — " +
              "compact datasets are driver-side only (axes), not " +
              "scan targets")
          case Hdf5.H5Contiguous(_) =>
            // each reader seeks into ITS time-chunk of the block
            (lo to hi by chunkSteps).map { t0 =>
              VPICInputPartition(root, label, t0,
                math.min(t0 + chunkSteps - 1, hi), nz, ny, nx,
                file = VPICSource.Hdf5File,
                dataOffset = d.dataAddress, littleEndian = d.littleEndian,
                elemSize = d.elemSize, fixedPoint = d.fixedPoint,
                signed = d.signed)
            }
          case Hdf5.H5Chunked(cd, gzip, shuffle, chunks, fletch) =>
            // the STORAGE chunk is the parallelism unit (a reader must
            // decompress a whole chunk anyway): one partition per
            // chunk, pruned to those whose time range intersects the
            // pushed bounds — a 1000-executor cluster decompresses
            // only the chunks it owns, never a neighbor's
            val Array(k0, k1, k2, k3) = cd.map(_.toInt)
            def part(c0: Int, c1: Int, c2: Int, c3: Int, addr: Long,
                storedBytes: Long) =
              VPICChunkPartition(root, label,
                addr = addr, storedBytes = storedBytes,
                gzip = gzip, shuffle = shuffle,
                littleEndian = d.littleEndian,
                elemSize = d.elemSize,
                c0 = c0, c1 = c1, c2 = c2, c3 = c3,
                k0 = k0, k1 = k1, k2 = k2, k3 = k3,
                n0 = nt, n1 = nz, n2 = ny, n3 = nx,
                itLo = lo, itHi = hi, fill = d.fill,
                fixedPoint = d.fixedPoint, signed = d.signed,
                fletcher = fletch)
            val inRange = chunks.filter(c =>
              c.offset(0) <= hi && c.offset(0) + k0 - 1 >= lo)
            val allocated = inRange.map { c =>
              part(c.offset(0).toInt, c.offset(1).toInt,
                c.offset(2).toInt, c.offset(3).toInt, c.addr,
                c.storedBytes)
            }
            // h5py allocates chunks lazily: grid slots in the pushed
            // time range with NO allocated chunk still contribute
            // rows — one IO-free FILL partition each (addr -1, no
            // bytes read; the reader synthesizes the fill value).
            // Metadata-scale work: the chunk grid is already the
            // index's granularity.
            val have = inRange.map(_.offset.toSeq).toSet
            val fills = for {
              t <- (lo / k0 * k0) to hi by k0
              z <- 0 until nz by k1
              y <- 0 until ny by k2
              x <- 0 until nx by k3
              if t >= 0 && t < nt
              if !have.contains(Seq(t.toLong, z.toLong, y.toLong, x.toLong))
            } yield part(t, z, y, x, -1L, 0L)
            allocated ++ fills
        }
      } else {
        val (nt, nz, ny, nx) = VPICSource.readHeader(path)
        val lo = math.max(0, itLo); val hi = math.min(nt - 1, itHi)
        (lo to hi by chunkSteps).map { t0 =>
          VPICInputPartition(path, label, t0,
            math.min(t0 + chunkSteps - 1, hi), nz, ny, nx)
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VPICReaderFactory(required.fieldNames)
}

/** `file`/`nvars`/`vidx` carry the layout: the per-variable tree reads
  * `data.bin` with stride 1, the interleaved tree reads the shared
  * `interleaved.bin` taking band `vidx` of `nvars` per cell, and the
  * HDF5 tree reads `data.h5` with `dataOffset` pointing at the
  * variable's contiguous block (`littleEndian` its byte order,
  * `elemSize` 4 for binary32 datasets widened to doubles on read).
  */
private[sources] case class VPICInputPartition(path: String, label: String,
    t0: Int, t1: Int, nz: Int, ny: Int, nx: Int,
    file: String = VPICSource.DataFile, nvars: Int = 1,
    vidx: Int = 0, dataOffset: Long = VPICSource.HeaderBytes.toLong,
    littleEndian: Boolean = false, elemSize: Int = 8,
    fixedPoint: Boolean = false, signed: Boolean = true)
  extends InputPartition

/** One STORAGE chunk of a chunked HDF5 dataset: `addr`/`storedBytes`
  * locate the (possibly deflated) stream, `c*` the chunk's dataset
  * offset, `k*` the chunk dims, `n*` the dataset dims (edge chunks
  * overhang and the overhang elements are skipped). The reader
  * decompresses exactly this chunk — per-chunk IO and memory.
  * `addr = -1` is an UNALLOCATED (sparse) chunk: no bytes exist on
  * disk and every in-bounds cell reads as `fill` — the h5py
  * lazy-allocation semantics, synthesized IO-free. `fixedPoint` /
  * `signed` select the class-0 int decode (widened to doubles).
  */
private[sources] case class VPICChunkPartition(root: String, label: String,
    addr: Long, storedBytes: Long, gzip: Boolean, shuffle: Boolean,
    littleEndian: Boolean,
    elemSize: Int, c0: Int, c1: Int, c2: Int, c3: Int,
    k0: Int, k1: Int, k2: Int, k3: Int,
    n0: Int, n1: Int, n2: Int, n3: Int,
    itLo: Int, itHi: Int, fill: Double = 0.0,
    fixedPoint: Boolean = false, signed: Boolean = true,
    fletcher: Boolean = false)
  extends InputPartition

private[sources] class VPICReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: VPICInputPartition => new VPICPartitionReader(p, fields)
      case p: VPICChunkPartition => new VPICChunkReader(p, fields)
    }
}

/** Streams one (variable, time-chunk): seeks past the header and earlier
  * chunks, then reads doubles sequentially — no full-file materialization.
  *
  * Hot loop: ONE mutable row is reused across `get()` calls and the
  * field-name -> source mapping is resolved once at construction — the
  * innermost scan loop does no allocation and no string matching
  * (downstream copies values out before the next `next()`, the standard
  * DSv2 row-reuse contract).
  */
private[sources] class VPICPartitionReader(p: VPICInputPartition,
    fields: Array[String]) extends PartitionReader[InternalRow] {
  private val dataPath = Paths.get(p.path, p.file)
  private def skipFully(n: Long): Unit = {
    var toSkip = n
    while (toSkip > 0) {
      val k = in.skip(toSkip)
      // unreachable for regular files after the size check below; kept
      // so a non-seekable stream can never spin forever
      if (k <= 0) throw new java.io.EOFException(
        s"skip stalled at $toSkip bytes before chunk it=${p.t0} ($dataPath)")
      toSkip -= k
    }
  }
  locally {
    // validate length up front: FileInputStream.skip may seek past EOF
    // and return a positive count, so a truncated file would otherwise
    // surface as a bare EOFException from readDouble deep in the scan —
    // this check names the file and the missing chunk. `dataOffset` is
    // the 16-byte raw header for the .bin layouts and the dataset's
    // contiguous-block address for the HDF5 layout.
    val need = p.dataOffset +
      (p.t1 + 1).toLong * p.nz * p.ny * p.nx * p.nvars * p.elemSize
    val have = java.nio.file.Files.size(dataPath)
    if (have < need) throw new java.io.EOFException(
      s"truncated $dataPath: $have bytes, " +
        s"chunk it=[${p.t0},${p.t1}] needs $need")
  }
  private val in = new DataInputStream(new BufferedInputStream(
    new FileInputStream(dataPath.toFile)))
  locally {
    // seek to this chunk's first value of band `vidx` (stride 1 and
    // vidx 0 for the per-variable and HDF5 layouts)
    skipFully(p.dataOffset +
      (p.t0.toLong * p.nz * p.ny * p.nx * p.nvars + p.vidx) * p.elemSize)
  }
  /** bytes between consecutive values of this band */
  private val gap = (p.nvars - 1).toLong * p.elemSize
  private var first = true
  private var it = p.t0; private var iz = 0; private var iy = 0
  private var ix = -1
  private var v = 0.0

  // 0=it 1=iz 2=iy 3=ix 4=value 5=var; var is constant, written once
  private val tags: Array[Int] = fields.map(Map(
    "it" -> 0, "iz" -> 1, "iy" -> 2, "ix" -> 3, "value" -> 4, "var" -> 5))
  private val row = new GenericInternalRow(fields.length)
  locally {
    val vi = tags.indexOf(5)
    if (vi >= 0) row.update(vi, UTF8String.fromString(p.label))
  }

  override def next(): Boolean = {
    ix += 1
    if (ix == p.nx) { ix = 0; iy += 1 }
    if (iy == p.ny) { iy = 0; iz += 1 }
    if (iz == p.nz) { iz = 0; it += 1 }
    if (it > p.t1) return false
    // interleaved band: hop over the other variables' values between
    // cells (gap = 0 on the per-variable layout — no-op)
    if (first) first = false else if (gap > 0) skipFully(gap)
    v = if (p.fixedPoint) {
      // class-0 fixed-point (HDF5 aux datasets), widened to double
      p.elemSize match {
        case 1 =>
          val b = in.readByte()
          if (p.signed) b.toDouble else (b & 0xff).toDouble
        case 2 =>
          val s = if (p.littleEndian)
            java.lang.Short.reverseBytes(in.readShort())
          else in.readShort()
          if (p.signed) s.toDouble else (s & 0xffff).toDouble
        case 4 =>
          val i = if (p.littleEndian)
            java.lang.Integer.reverseBytes(in.readInt())
          else in.readInt()
          if (p.signed) i.toDouble
          else (i.toLong & 0xffffffffL).toDouble
        case _ =>
          val l = if (p.littleEndian)
            java.lang.Long.reverseBytes(in.readLong())
          else in.readLong()
          if (p.signed || l >= 0) l.toDouble
          else (l & Long.MaxValue).toDouble + 9.223372036854775808e18
      }
    } else if (p.elemSize == 4) {
      val bits = if (p.littleEndian)
        java.lang.Integer.reverseBytes(in.readInt())
      else in.readInt()
      java.lang.Float.intBitsToFloat(bits).toDouble
    } else if (p.littleEndian)
      java.lang.Double.longBitsToDouble(
        java.lang.Long.reverseBytes(in.readLong()))
    else in.readDouble()
    true
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < tags.length) {
      tags(i) match {
        case 0 => row.setInt(i, it)
        case 1 => row.setInt(i, iz)
        case 2 => row.setInt(i, iy)
        case 3 => row.setInt(i, ix)
        case 4 => row.setDouble(i, v)
        case _ => () // var: constant, already set
      }
      i += 1
    }
    row
  }

  override def close(): Unit = in.close()
}

/** Reads ONE storage chunk of a chunked HDF5 dataset: seeks to the
  * chunk's stored bytes, inflates them if deflated (per-chunk
  * decompression — this partition never touches a neighbor chunk's
  * bytes), then walks the chunk row-major emitting in-bounds cells.
  * Memory high-water mark is one decoded chunk — the layout's own
  * granularity. Same reused-mutable-row hot loop as the contiguous
  * reader.
  */
private[sources] class VPICChunkReader(p: VPICChunkPartition,
    fields: Array[String]) extends PartitionReader[InternalRow] {
  // an UNALLOCATED chunk partition (addr -1) synthesizes the fill
  // value with zero IO — bytes stay null and are never touched
  private val bytes: Array[Byte] = if (p.addr < 0) null else {
    val path = Paths.get(p.root, VPICSource.Hdf5File)
    val raf = new java.io.RandomAccessFile(path.toFile, "r")
    try {
      if (p.addr + p.storedBytes > raf.length())
        throw new java.io.EOFException(
          s"truncated $path: chunk at ${p.addr} needs " +
            s"${p.storedBytes} bytes, file has ${raf.length()}")
      val raw = new Array[Byte](p.storedBytes.toInt)
      raf.seek(p.addr)
      raf.readFully(raw)
      // index-time validation guarantees chunkBytes <= Int.MaxValue;
      // Long math here so a bad partition can never overflow silently
      val expect =
        p.k0.toLong * p.k1 * p.k2 * p.k3 * p.elemSize
      require(expect <= Int.MaxValue,
        s"chunk of $expect bytes at ${p.addr} ($path)")
      Hdf5.decodeChunk(raw, expect.toInt, p.gzip, p.shuffle,
        p.elemSize, p.fletcher)
    } finally raf.close()
  }
  private val bb = if (bytes == null) null
    else java.nio.ByteBuffer.wrap(bytes).order(
      if (p.littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)

  // local chunk coords, advanced incrementally (no div/mod per cell)
  private var lt = 0; private var lz = 0; private var ly = 0
  private var lx = -1
  private var l = -1 // linear index within the decoded chunk
  private var it = 0; private var iz = 0; private var iy = 0
  private var ix = 0
  private var v = 0.0

  private val tags: Array[Int] = fields.map(Map(
    "it" -> 0, "iz" -> 1, "iy" -> 2, "ix" -> 3, "value" -> 4, "var" -> 5))
  private val row = new GenericInternalRow(fields.length)
  locally {
    val vi = tags.indexOf(5)
    if (vi >= 0) row.update(vi, UTF8String.fromString(p.label))
  }

  override def next(): Boolean = {
    // exhaustion is a STABLE state: once lt reaches k0 every further
    // next() returns false without touching the counters — Spark
    // never re-probes, but a wrapper/retry that does must not index
    // bb past the decoded chunk or spin
    if (lt >= p.k0) return false
    while (true) {
      lx += 1; l += 1
      if (lx == p.k3) { lx = 0; ly += 1 }
      if (ly == p.k2) { ly = 0; lz += 1 }
      if (lz == p.k1) { lz = 0; lt += 1 }
      if (lt == p.k0) return false
      it = p.c0 + lt; iz = p.c1 + lz; iy = p.c2 + ly; ix = p.c3 + lx
      // skip edge-chunk overhang and rows outside the pushed it range
      if (it >= p.itLo && it <= p.itHi && it < p.n0
          && iz < p.n1 && iy < p.n2 && ix < p.n3) {
        v = if (bb == null) p.fill // unallocated chunk: fill value
            else Hdf5.decodeElem(bb, l, p.elemSize, p.fixedPoint,
              p.signed)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < tags.length) {
      tags(i) match {
        case 0 => row.setInt(i, it)
        case 1 => row.setInt(i, iz)
        case 2 => row.setInt(i, iy)
        case 3 => row.setInt(i, ix)
        case 4 => row.setDouble(i, v)
        case _ => () // var: constant, already set
      }
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}
