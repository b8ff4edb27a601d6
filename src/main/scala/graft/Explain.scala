package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named queries (or the
  * slow set by default) at sf0.001 — the ".explain and iterate" loop
  * from the build brief, one command:
  *   sbt "runMain graft.Explain q106_sparse_cosine_full g16_grid3d_smooth"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q50_dedup_clusters", "q99_dedup_keep_best",
        "q104_cluster_policy_compare", "q105_setsim_full",
        "q106_sparse_cosine_full", "g16_grid3d_smooth")
    // env-overridable so plans can be captured at bench conditions
    // (sf0.1, local[32]) as well as the quick sf0.001 default
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      QueryRegistry.queries(n)(spark, sfDir)
        .explain("formatted")
      CacheScope.flush(spark)
    }
    spark.stop()
  }
}
