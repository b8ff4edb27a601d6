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
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      QueryRegistry.queries(n)(spark, "/root/testdata/sf0.001")
        .explain("formatted")
      CacheScope.flush(spark)
    }
    spark.stop()
  }
}
