package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    def corpus(k: Int) = (0 until k).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionAll _)
    for (k <- Seq(1, 4, 10)) {
      val c = corpus(k)
      val t0 = System.nanoTime()
      val n = graft.dedup.DedupQueries.dedupClustersStarOf(c).count()
      CacheScope.flush(spark)
      println(f"[scale] k=$k docs=${5000L*k} clusters_rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
