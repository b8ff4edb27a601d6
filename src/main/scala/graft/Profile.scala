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

    spark.stop()
  }
}
