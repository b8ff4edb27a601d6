package graft.similarity

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF-index artifact (the ANN-side twin of the dedup
  * index): the artifact-read recall query (q118) must agree
  * frame-for-frame with the recompute path (q89), and the parquet
  * round-trip of the centroid/assignment tables must be exact.
  */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q118 (artifact-read) equals q89 (recompute) row for row") {
    val a = graft.QueryRegistry.queries("q89_ivf_recall")(spark, sf)
      .collect().toSeq
    graft.CacheScope.flush(spark)
    val b = graft.QueryRegistry.queries("q118_indexed_ann")(spark, sf)
      .collect().toSeq
    graft.CacheScope.flush(spark)
    assert(a.nonEmpty && a == b)
  }

  test("trained quantizer round-trips through save/load: identical " +
      "centers, identical q46-shaped search output") {
    import org.apache.spark.ml.functions.array_to_vector
    val emb = graft.Tables.embeddings(spark, sf)
      .withColumn("features",
        array_to_vector(transform(col("embedding"), x => x.cast("double"))))
    val fitted = SimilarityQueries.fitIvfQuantizer(emb)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_model_spec").toString
    SimilarityQueries.saveIvfQuantizer(fitted, dir)
    val loaded = SimilarityQueries.loadIvfQuantizer(spark, dir)
    assert(fitted.clusterCenters.map(_.toArray.toSeq).toSeq
      == loaded.clusterCenters.map(_.toArray.toSeq).toSeq)
    val a = SimilarityQueries.annIvfWith(emb, fitted, probeId = 0, k = 10)
      .collect().toSeq
    val b = SimilarityQueries.annIvfWith(emb, loaded, probeId = 0, k = 10)
      .collect().toSeq
    assert(a.nonEmpty && a == b)
    graft.CacheScope.flush(spark)
  }

  test("index round-trip: assignments cover every vector exactly once " +
      "and centroids carry one row per (label, dim)") {
    val emb = graft.Tables.embeddings(spark, sf)
    val f = emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("i", "v")))
      .withColumn("v", col("v").cast("double"))
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    SimilarityQueries.buildIvfIndex(f, idx)
    val n = emb.count()
    val assign = spark.read.parquet(idx + "/assignments")
    assert(assign.count() == n)
    assert(assign.select("vec_id").distinct().count() == n)
    val cent = spark.read.parquet(idx + "/centroids")
    val labels = emb.select("label").distinct().count()
    val dims = f.select("i").distinct().count()
    assert(cent.count() == labels * dims)
    // assignments reference only labels that exist in the centroid table
    assert(assign.join(cent.select(col("clabel").as("lst")).distinct(),
      Seq("lst"), "left_anti").isEmpty)
    graft.CacheScope.flush(spark)
  }
}
