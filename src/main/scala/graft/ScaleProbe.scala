package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scaling probe: replicate the sf0.1 corpus k-fold (doc_id
  * offsets keep ids unique, so every doc gains k-1 exact twins — the
  * DEGENERATE mega-bucket case for LSH) and time the dedup paths.
  *
  * Measured on local[32]:
  *   clusters  (star-contracted CC)  k=1: ~7s warm   k=10: ~7-8s  — linear
  *   dup_ngrams (window-hash counts) — linear in corpus size
  *   minhash_pairs (pairwise est graph) k=1: 6.1M rows, k=4: 97.9M rows
  *     — exactly 16x for 4x docs: the k^2 pair blowup BY CONSTRUCTION.
  * That contrast is the design argument for [[graft.dedup.DedupQueries
  * .dedupClustersStarOf]]: clustering must never materialize the
  * pairwise graph on a twin-heavy corpus. The pairwise probe is capped
  * at k=4 for exactly that reason.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    def corpus(k: Int) = (0 until k).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionAll _)
    def probe(name: String, ks: Seq[Int])(f: org.apache.spark.sql.DataFrame => Long): Unit =
      for (k <- ks) {
        val c = corpus(k)
        val t0 = System.nanoTime()
        val n = f(c)
        CacheScope.flush(spark)
        println(f"[scale] $name k=$k docs=${5000L * k} rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    probe("clusters", Seq(1, 4, 10))(c =>
      graft.dedup.DedupQueries.dedupClustersStarOf(c).count())
    probe("dup_ngrams", Seq(1, 4, 10))(c =>
      graft.dedup.DedupQueries.dupNgramStats(c, graft.dedup.DedupQueries.DupW).count())
    // pairwise est graph: k^2 pair growth by construction — k capped
    probe("minhash_pairs", Seq(1, 4))(c =>
      graft.dedup.DedupQueries.minhashPairsOf(c).count())
    spark.stop()
  }
}
