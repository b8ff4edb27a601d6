package graft
import org.apache.spark.sql.SparkSession

/** Bench harness: min-of-3 wall time per declared query, ONE JSON line.
  *
  * MEASUREMENT SEMANTICS: each query is forced with count(), so
  * Catalyst may prune value-only expressions in the final projection
  * that cannot change the row count — the number is "time to compute
  * the result set", applied identically every round, which keeps
  * round-over-round comparisons valid. Full-materialization costs
  * (every column priced, the plan a consumer writing results would
  * pay) are measured where they are the point: Verify writes parquet,
  * and Profile/ScaleProbe force priced columns with agg(sum(...)) —
  * the round-13 q158 work was found and fixed through exactly that
  * forced path after count() had hidden a 15 s evaluation cost.
  *
  * Round 9 adds per-query FORENSICS (a SparkListener window around each
  * query's three runs): job/task counts, shuffle read/write bytes,
  * task-attributed GC ms, spill bytes, plus a whole-JVM GC-time delta
  * and the post-query size of Spark's scratch dirs. Motivation: two
  * LSH-band queries (q30/q95) read 3.5-4.2x their isolated cost
  * in-suite across rounds 7-8 with the code unchanged — the forensic
  * fields make the inflation source (GC debt vs shuffle-dir growth vs
  * genuine recompute) visible IN the bench artifact instead of needing
  * a by-hand isolated re-measure every round.
  */
object Bench {
  private class Forensics extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
    val jobs = new AtomicInteger; val tasks = new AtomicInteger
    val gcMs = new AtomicLong
    val shRead = new AtomicLong; val shWrite = new AtomicLong
    val spill = new AtomicLong
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet(): Unit
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      Option(t.taskMetrics).foreach { m =>
        tasks.incrementAndGet()
        gcMs.addAndGet(m.jvmGCTime)
        shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled): Unit
      }
    def reset(): Unit = {
      jobs.set(0); tasks.set(0)
      gcMs.set(0); shRead.set(0); shWrite.set(0); spill.set(0)
    }
  }

  /** Whole-JVM cumulative GC time (driver + executors: local mode is
    * one JVM) — the delta across a query window catches collection
    * debt the task-attributed jvmGCTime misses (e.g. GC during
    * planning, or debt paid inside the System.gc() fence).
    */
  private def jvmGcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  /** Total bytes under Spark's scratch dirs ("blockmgr-" and "spark-"
    * prefixed dirs in the local dir root) — growth across the suite is
    * the shuffle-file accumulation hypothesis, measured.
    */
  private def scratchBytes(): Long = {
    def size(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      else f.length
    val root = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(root.listFiles).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("blockmgr-")
        || f.getName.startsWith("spark-"))
      .map(size).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet paths so the first measured query
    // doesn't absorb ~5s of one-time session cost.
    try {
      spark.range(100000).groupBy((org.apache.spark.sql.functions.col("id") % 7)
        .as("k")).count().count()
      Tables.lineitem(spark, sfDir).limit(1000).count()
    } catch { case _: Throwable => () }
    val forensics = new Forensics
    spark.sparkContext.addSparkListener(forensics)
    // Three timed runs per query, report the min: the first run absorbs
    // parquet page-cache and codegen warmup plus host-VM noise; min-of-3
    // (vs min-of-2) cuts the residual run-to-run jitter that made
    // sub-second queries look 3-5x off between driver rounds.
    val Runs = 3
    // Dev aid: SPARK_GRAFT_ONLY=q1,q2 restricts to a comma-separated
    // subset (substring match) for single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    // Dev aid: SPARK_GRAFT_BENCH_FORCE=1 forces FULL materialization of
    // every column via the noop sink instead of count() — the number a
    // consumer writing results would pay (count() lets Catalyst prune
    // value-only projections; see the measurement-semantics note
    // above). Diagnostics only: the driver's round-over-round gate and
    // BENCH_LOCAL.json stay count()-based for comparability.
    val forceAll = sys.env.get("SPARK_GRAFT_BENCH_FORCE").contains("1")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      if (forceAll) df.write.format("noop").mode("overwrite").save()
      else { df.count(); () }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.contains)) }
    val results = selected.map { case (name, fn) =>
      forensics.reset()
      val gc0 = jvmGcMs()
      val timed = try (0 until Runs).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true }
        catch { case _: Throwable => false }
        (ok, (System.nanoTime() - t0) / 1e9)
      } finally CacheScope.flush(spark, blocking = true)
      // flush AFTER both runs: run 2 legitimately hits the CacheManager's
      // plan-equality reuse of run 1's scoped persists (steady-state
      // latency of a warm deployment), while the blocks still die with
      // the query instead of accumulating across the suite. BLOCKING
      // here (Bench only): the removal must complete before the next
      // query's clock starts, or its cost lands in that window.
      // min over SUCCESSFUL runs only — a fast failure must not mask a
      // slow success; a query with no successful run reports its max
      // elapsed (visible cost, never a bogus near-zero)
      val good = timed.collect { case (true, t) => t }
      // a GC fence between queries: collection debt from query N must not
      // be paid inside query N+1's timing window
      System.gc()
      // drain margin: listener bus is async; the fenced GC above plus
      // this snapshot point leave job/task-end events ~always processed
      val sec = if (good.nonEmpty) good.min else timed.map(_._2).max
      val f = Map(
        "runs" -> timed.map(t => f"${t._2}%.3f").mkString("[", ",", "]"),
        "jobs" -> forensics.jobs.get.toString,
        "tasks" -> forensics.tasks.get.toString,
        "gc_task_ms" -> forensics.gcMs.get.toString,
        "gc_jvm_ms" -> (jvmGcMs() - gc0).toString,
        "shuffle_read_mb" ->
          f"${forensics.shRead.get / 1048576.0}%.1f",
        "shuffle_write_mb" ->
          f"${forensics.shWrite.get / 1048576.0}%.1f",
        "spill_mb" -> f"${forensics.spill.get / 1048576.0}%.1f",
        "scratch_mb_after" -> f"${scratchBytes() / 1048576.0}%.1f")
      (name, sec, f)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fo = results.map { case (k, _, f) =>
      "\"" + k + "\":" + f.map { case (fk, fv) =>
        val quoted = if (fk == "runs" || fv.forall(c =>
          c.isDigit || c == '.' || c == '-')) fv else "\"" + fv + "\""
        "\"" + fk + "\":" + quoted
      }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","runs":$Runs,"queries":$qs,"forensics":$fo,"sf":"$sfDir"}"""
    println(json)
    // The driver parses a bounded TAIL of captured stdout; the full
    // line above overflows it (170+ queries of forensics), which has
    // left BENCH_r*.json `parsed: null` for several rounds. End stdout
    // with a COMPACT summary line (no per-query map) so the tail is
    // parseable JSON; the full artifact of record is the file below.
    // "total_summary", not "total": line-oriented consumers that grep
    // or sum metric:total lines must not conflate this tail line with
    // the full forensics line above or double-count the suite.
    println(s"""{"metric":"total_summary","value":$total,"unit":"sec","runs":$Runs,"n_queries":${results.size},"sf":"$sfDir","detail":"BENCH_LOCAL.json"}""")
    // The driver captures sbt stdout, where the `[info] ` prefix and tail
    // truncation have defeated its JSON parser three rounds straight
    // (BENCH_r07-r09 all `parsed: null`). Persist the identical line to a
    // file as the machine-readable artifact of record: repo-root
    // BENCH_LOCAL.json (committed each round) or SPARK_GRAFT_BENCH_OUT.
    // The committed default is FULL-SUITE ONLY — a SPARK_GRAFT_ONLY dev
    // iteration must not clobber the round's official numbers with a
    // partial total (point SPARK_GRAFT_BENCH_OUT somewhere to keep a
    // filtered run's JSON).
    // forced-materialization runs never overwrite the committed
    // count()-based artifact — they measure different semantics
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .orElse(if (only.isEmpty && !forceAll) Some("BENCH_LOCAL.json")
        else None)
    outPath match {
      case Some(p) =>
        try {
          java.nio.file.Files.write(
            java.nio.file.Paths.get(p),
            (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] could not write $p: $e")
        }
      case None =>
        val why = if (forceAll) "forced-materialization run" else "filtered run"
        System.err.println(
          s"[bench] $why: BENCH_LOCAL.json left untouched " +
            "(set SPARK_GRAFT_BENCH_OUT to keep this run's JSON)")
    }
    spark.stop()
  }
}
