package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity over the declared inventory on sf0.001 (full oracle equivalence
  * is the driver's t2 gate; tools/check.py runs it locally).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("every declared query runs and yields rows on sf0.001") {
    QueryRegistry.all.foreach { q =>
      val n = q.fn(spark, sf).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("oracle SQL exists for all SQL-expressible queries") {
    val noOracle = QueryRegistry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle == Seq("q30_minhash_lsh_pairs"), s"unexpected: $noOracle")
  }

  test("q19 distinct flags: exactly the 6 known (rf, ls) pairs") {
    val rows = QueryRegistry.queries("q19_distinct_flags")(spark, sf).collect()
    assert(rows.length == 6)
  }

  test("q31 cosine topk returns 10 neighbors with sim in [-1, 1]") {
    val rows = QueryRegistry.queries("q31_cosine_topk")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("cos_sim")) <= 1.0))
  }

  test("minhash estimates track exact jaccard for high-sim pairs") {
    import org.apache.spark.sql.functions._
    val est = dedup.DedupQueries.minhashPairs(spark, sf)
      .filter(col("est_jaccard") >= 0.75).limit(20).collect()
    if (est.nonEmpty) {
      val exact = QueryRegistry.queries("q29_jaccard_vs_doc0")(spark, sf)
      // spot-check shape only here; numeric agreement is probabilistic.
      assert(exact.columns.toSeq == Seq("doc_id", "jaccard"))
    }
  }
}
