package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: times the internal stages of the slowest bench queries
  * so optimization work targets the real bottleneck, not the whole
  * pipeline. Not part of the driver contract.
  *
  * Round-7 finding, q100 regression (r5 0.92 s -> r6 1.70 s driver):
  * the r6 refactor into [[graft.dedup.DedupQueries.sparseCosinePairsOf]]
  * is a pure extraction — the helper body is the r5 inline body line
  * for line (same retain on `w`, same posting join, no new exchange;
  * verified by plan inspection and a textual diff against commit
  * 962bc55). Locally the query benches at ~1.1 s and the stage split
  * below shows the cost sitting where it always did (the posting-list
  * dot join), so the r6 driver reading is host variance, not a plan
  * change. Same conclusion for q11 (0.15 -> 0.35 driver, 0.17 local).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warmup
    spark.range(100000).groupBy((col("id") % 7).as("k")).count().count()

    // q158 on the ScaleProbe longdoc synthesis (2M tokens, 30-word
    // periodic vocab — the every-window-duplicated worst case)
    if (sys.env.get("SPARK_GRAFT_PROFILE_ONLY").contains("q158long")) {
      import graft.text.TextQueries
      val c = ScaleProbe.longDocCorpus(spark, 200, 10000).persist()
      time("longdoc materialize")(c.count())
      val aug = TextQueries.repetitionAugmented(c)
      // agg-forced: count() would let pruning drop the priced columns
      time("q158long ngram half")(TextQueries.repetitionSignalsOf(aug)
        .agg(sum(col("keep_ngram").cast("long"))).head.getLong(0))
      CacheScope.flush(spark)
      time("q158long line half")(TextQueries.lineRepetitionSignalsOf(aug)
        .agg(sum(col("keep_line").cast("long"))).head.getLong(0))
      CacheScope.flush(spark)
      time("q158long full gate")(TextQueries.repetitionGate(aug)
        .agg(sum(col("keep_repetition").cast("long"))).head.getLong(0))
      CacheScope.flush(spark)
      c.unpersist()
      spark.stop()
      return
    }
    // fast loop for one query family: SPARK_GRAFT_PROFILE_ONLY=q158
    if (sys.env.get("SPARK_GRAFT_PROFILE_ONLY").contains("q158")) {
      import graft.text.TextQueries
      val d = Tables.documents(spark, sfDir).select("doc_id", "text")
      val aug = TextQueries.repetitionAugmented(d)
      time("q158 aug materialize")(aug.count())
      // agg-forced: count() would let pruning drop the priced columns
      time("q158 ngram half")(TextQueries.repetitionSignalsOf(aug)
        .agg(sum(col("keep_ngram").cast("long"))).head.getLong(0))
      CacheScope.flush(spark)
      time("q158 line half")(TextQueries.lineRepetitionSignalsOf(aug)
        .agg(sum(col("keep_line").cast("long"))).head.getLong(0))
      CacheScope.flush(spark)
      time("q158 full gate")(TextQueries.repetitionGate(aug)
        .agg(sum(col("keep_repetition").cast("long"))).head.getLong(0))
      CacheScope.flush(spark)
      time("q158 full gate again")(TextQueries.repetitionGate(aug)
        .agg(sum(col("keep_repetition").cast("long"))).head.getLong(0))
      CacheScope.flush(spark)
      spark.stop()
      return
    }

    import graft.grid.{GridQueries, GridOps, Topology}
    val g = GridQueries.grid(spark, sfDir)
    time("grid materialize")(g.count())
    val NZ = GridQueries.NZ; val NX = GridQueries.NX
    val mx = GridOps.extremumFilter(g, "b1", NZ, NX, isMax = true, "fmax")
    time("g14 extremumFilter")(mx.count())
    val mxc = mx.localCheckpoint()
    time("g14 localCheckpoint")(mxc.count())
    val thr = mxc.groupBy("it")
      .agg((avg("fmax") + lit(1) * stddev_pop("fmax")).as("thr"))
    val hot = mxc.join(broadcast(thr), Seq("it"))
      .filter(col("fmax") > col("thr")).select("it", "iz", "ix")
    time("g14 threshold+filter")(hot.count())
    val comp = Topology.connectedComponents(hot, NX)
    time("g14 connectedComponents")(comp.count())
    val withV = comp.join(g.select("it", "iz", "ix", "b1"), Seq("it", "iz", "ix"))
    val peak = withV.groupBy("it", "comp").agg(max("b1").as("peak"))
    time("g14 peak join")(withV.join(peak, Seq("it", "comp"))
      .filter(col("b1") === col("peak")).count())

    import graft.dedup.DedupQueries
    val docs = Tables.documents(spark, sfDir)
    val sig = DedupQueries.minhashSignaturesOf(docs)
    time("q50 signatures")(sig.count())
    val stars = DedupQueries.starEdges(sig.localCheckpoint())
    time("q50 starEdges")(stars.count())
    time("q50 full clustering")(DedupQueries.dedupClustersStarOf(docs).count())

    // q100 stage split (see doc comment: r6 driver regression was host
    // variance — this breakdown pins where the real cost lives)
    val sub = docs.filter(col("doc_id") < DedupQueries.SparseCosDocLimit)
    val tf = sub.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    time("q100 tf")(tf.count())
    val tfc = tf.localCheckpoint()
    val dfreq = tfc.groupBy("token").agg(count(lit(1)).as("df"))
    val w = tfc.join(dfreq, Seq("token"))
      .crossJoin(broadcast(sub.agg(count(lit(1)).as("n_docs"))))
      .select(col("doc_id"), col("token"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("w"))
      .localCheckpoint()
    time("q100 weights")(w.count())
    val a = w.select(col("doc_id").as("doc_a"), col("token"), col("w").as("wa"))
    val b = w.select(col("doc_id").as("doc_b"), col("token"), col("w").as("wb"))
    time("q100 posting dot join")(a.join(b, Seq("token"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("wa") * col("wb")).as("dot"))
      .count())
    time("q100 full query")(
      DedupQueries.sparseCosinePairs(sub, DedupQueries.SparseCosT).count())

    // g19 job-count breakdown: how many Spark jobs does the master
    // pipeline schedule, and where does the wall time sit? (The bench
    // cost is fixed per-job overhead, invariant in grid size — this
    // section keeps that claim measured rather than asserted.)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stageMs = new java.util.concurrent.atomic.AtomicLong
    val jobListener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        for (s <- si.submissionTime; c <- si.completionTime)
          stageMs.addAndGet(c - s)
      }
    }
    spark.sparkContext.addSparkListener(jobListener)
    // `stage` = summed in-stage execution time: the gap between it and
    // wall is driver-side work (planning, AQE re-optimization, codegen,
    // job scheduling) — the part that does NOT grow with data.
    def jcount(label: String)(f: => Long): Unit = {
      val j0 = jobs.get; val s0 = stageMs.get; val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n  jobs=${jobs.get - j0}  stage=${(stageMs.get - s0) / 1e3}%.2f s")
    }
    import graft.grid.{FindStructures, TopologyQueries}
    val ds19 = TopologyQueries.g19Input(spark, sfDir)
    jcount("g19 input materialize")(ds19.variables("b1").df.count())
    // stage split mirroring FindStructures' wiring (24x24, smoothing=1)
    locally {
      val b1 = ds19.variables("b1"); val b2 = ds19.variables("b2")
      val zAxis = b1.spaceAxes(0)._2; val xAxis = b1.spaceAxes(1)._2
      val dz = zAxis(1) - zAxis(0); val dxx = xAxis(1) - xAxis(0)
      val nz19 = zAxis.length; val nx19 = xAxis.length
      val joined = b1.df.select(col("it"), col("iz"), col("ix"), col("t"),
          col("value").as("b1v"))
        .join(b2.df.select(col("it").as("it2"), col("iz").as("iz2"),
          col("ix").as("ix2"), col("value").as("b2v")),
          col("it") === col("it2") && col("iz") === col("iz2")
            && col("ix") === col("ix2"))
        .drop("it2", "iz2", "ix2")
      val smoothed = CacheScope.retain(
        GridOps.gaussianSmoothAxesMulti(joined,
          Seq("b1v" -> "b1_smooth", "b2v" -> "b2_smooth"), 1.0,
          Seq("iz" -> nz19, "ix" -> nx19)))
      jcount("g19 smoothing")(smoothed.count())
      val flux = CacheScope.retain(
        GridOps.fluxfn(smoothed, "b1_smooth", "b2_smooth", dz, dxx)
          .withColumnRenamed("psi", "flux_fn"))
      jcount("g19 fluxfn")(flux.count())
      val g1 = GridOps.gradient(flux, "b1_smooth", "iz", dz, "db1_d1")
      val g3 = GridOps.gradient(g1, "b2_smooth", "iz", dz, "db2_d1")
      val g2 = GridOps.gradient(g3, "b1_smooth", "ix", dxx, "db1_d2")
      val g4 = GridOps.gradient(g2, "b2_smooth", "ix", dxx, "db2_d2")
      val hess = CacheScope.retain(g4.withColumn("fluxfn_hessian_det",
        col("db1_d2") * (-col("db2_d1")) - (-col("db2_d2")) * col("db1_d1")))
      jcount("g19 gradients+hessian")(hess.count())
      val nulls = Topology.segmentIntersections(
        Topology.contourSegments(hess, "b1_smooth", 0.0),
        Topology.contourSegments(hess, "b2_smooth", 0.0))
      var xC: Seq[(Double, Double)] = null
      jcount("g19 nulls+classify collect") {
        val cls = Topology.bilinearSample(hess, "fluxfn_hessian_det",
            nulls.select(col("it"), col("py"), col("px")), "hdi")
          .filter(col("it") === 0).collect()
        xC = cls.filter(r => math.signum(r.getAs[Double]("hdi")) == -1.0)
          .map(r => (r.getAs[Double]("py"), r.getAs[Double]("px"))).toSeq
        cls.length.toLong
      }
      val dPerDe = ((1 / dz + 1 / dxx) / 2).toInt
      jcount("g19 separatrices")(Topology.separatrices(hess, "flux_fn", 0,
        xC, nz19, nx19, dPerDe * 5.0).count())
      val jy = ds19.variables("jy")
      val jySm = GridOps.gaussianSmooth(
        jy.df.select(col("it"), col("iz"), col("ix"), col("value")),
        "value", 1.0, nz19, nx19, "jy_smooth")
      jcount("g19 currentSheets")(Topology.currentSheets(
        jySm.select(col("it"), col("iz"), col("ix"), col("jy_smooth")),
        "jy_smooth", nz19, nx19, 0.5).count())
      CacheScope.flush(spark)
    }
    var res: FindStructures.Result = null
    jcount("g19 FindStructures (build+collect)") {
      res = FindStructures(ds19, smoothing = 1.0, deTol = 5.0)
      res.xCoords.size.toLong
    }
    jcount("g19 separatrices action")(
      res.dataset.variables("separatrices").df.count())
    jcount("g19 o_structures action")(
      res.dataset.variables("o_structures").df.count())
    jcount("g19 current_sheets action")(
      res.dataset.variables("current_sheets").df.count())
    CacheScope.flush(spark)
    spark.sparkContext.removeSparkListener(jobListener)

    spark.stop()
  }
}
