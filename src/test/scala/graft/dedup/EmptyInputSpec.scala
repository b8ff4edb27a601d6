package graft.dedup

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior: every dedup operator must return an empty
  * (or all-singleton) result on an empty corpus without erroring — the
  * guard for pipeline stages that filter a partition down to nothing.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def empty = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("signatures, bands, and pair join are empty on an empty corpus") {
    assert(DedupQueries.signaturesPerRow(empty).count() == 0)
    assert(DedupQueries.bandBucketsPerRow(empty).count() == 0)
    assert(DedupQueries.minhashPairsOf(empty).count() == 0)
  }

  test("clustering on an empty corpus is empty; no edges means singletons") {
    assert(DedupQueries.dedupClustersStarOf(empty).count() == 0)
    // a corpus with no near-dup pairs: every doc is its own canonical
    val disjoint = Seq((0L, "aa bb cc"), (1L, "dd ee ff"), (2L, "gg hh ii"))
      .toDF("doc_id", "text")
    val cl = DedupQueries.dedupClustersStarOf(disjoint).collect()
    assert(cl.length == 3 && cl.forall(_.getAs[Boolean]("is_canonical")))
  }

  test("dup-ngram stats and set-sim join handle empty and sub-window docs") {
    assert(DedupQueries.dupNgramStats(empty, 3).count() == 0)
    assert(DedupQueries.setSimJoin(empty, 0.85).count() == 0)
    val short = Seq((0L, "only two")).toDF("doc_id", "text")
    val row = DedupQueries.dupNgramStats(short, 5).head()
    assert(row.getLong(1) == 0L && row.getDouble(3) == 0.0)
  }
}
