package graft.sources

import graft.SharedSpark
import graft.dedup.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The versioned-artifact protocol: immutable version dirs + an
  * atomically-swapped CURRENT pointer give zero-downtime rebuilds —
  * a reader that resolved a version keeps a consistent artifact
  * across a concurrent publish, and the new version only becomes
  * visible at the pointer flip.
  */
class ArtifactVersionsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("prepare/publish mechanics: numbering, pointer, late visibility") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_artver").toString
    assert(ArtifactVersions.current(root).isEmpty)
    val v1 = ArtifactVersions.prepareNext(root)
    assert(v1.endsWith("v1"))
    // prepared but unpublished versions are invisible to readers
    assert(ArtifactVersions.current(root).isEmpty)
    ArtifactVersions.publish(root, v1)
    assert(ArtifactVersions.current(root).contains(v1))
    val v2 = ArtifactVersions.prepareNext(root)
    assert(v2.endsWith("v2"))
    assert(ArtifactVersions.current(root).contains(v1))
    ArtifactVersions.publish(root, v2)
    assert(ArtifactVersions.current(root).contains(v2))
  }

  test("zero-downtime dedup-index rebuild: old version serves during and after") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_artver_idx").toString
    // v1: base corpus, published and resolved by a "reader"
    val v1 = ArtifactVersions.prepareNext(root)
    DedupQueries.buildDedupIndex(docs.filter(col("doc_id") < 25), v1)
    ArtifactVersions.publish(root, v1)
    val readerPath = ArtifactVersions.current(root).get
    assert(DedupQueries.indexSignatures(spark, readerPath).count() == 25)
    // rebuild (e.g. a drift trigger fired): the wider corpus goes into
    // v2 while the v1 reader keeps serving
    val v2 = ArtifactVersions.prepareNext(root)
    DedupQueries.buildDedupIndex(docs.filter(col("doc_id") < 40), v2)
    assert(DedupQueries.indexSignatures(spark, readerPath).count() == 25,
      "reader disturbed by an unpublished rebuild")
    ArtifactVersions.publish(root, v2)
    // new resolutions see v2; the held v1 path stays intact
    assert(DedupQueries.indexSignatures(spark,
      ArtifactVersions.current(root).get).count() == 40)
    assert(DedupQueries.indexSignatures(spark, readerPath).count() == 25,
      "published rebuild must not rewrite old versions")
    graft.CacheScope.flush(spark)
  }
}
