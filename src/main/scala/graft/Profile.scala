package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: times the internal stages of the slowest bench queries
  * so optimization work targets the real bottleneck, not the whole
  * pipeline. Not part of the driver contract.
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

    spark.stop()
  }
}
