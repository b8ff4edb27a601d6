package graft.dedup

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("simhash: permuting token order leaves the signature unchanged") {
    val sig = DedupQueries.simhash(spark, sf)
      .limit(5).as[(Long, Long)].collect().toMap
    // recompute from reversed-token documents: token SET is identical,
    // run through the SAME production code path
    val docs = graft.Tables.documents(spark, sf)
      .withColumn("text", array_join(reverse(split(col("text"), " ")), " "))
    val permuted = DedupQueries.simhashOf(docs)
      .filter(col("doc_id") < 5).as[(Long, Long)].collect().toMap
    sig.foreach { case (id, s0) => assert(permuted(id) == s0, s"doc $id") }
  }

  test("minhash estimate correlates with exact jaccard on candidate pairs") {
    val pairs = DedupQueries.minhashPairs(spark, sf).limit(50)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    // exact jaccard for those pairs
    val toks = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token")).distinct()
    val sets = toks.as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var totalErr = 0.0
    pairs.foreach { case (a, b, est) =>
      val (sa, sb) = (sets(a), sets(b))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      totalErr += math.abs(est - exact)
    }
    val mae = totalErr / pairs.length
    // 16 permutations -> standard error ~0.125 for mid jaccard
    assert(mae < 0.2, s"mean abs error $mae too high")
  }

  test("setSimJoin equals the brute-force pair scan at another threshold") {
    val docs = graft.Tables.documents(spark, sf).filter(col("doc_id") < 80)
    val fast = DedupQueries.setSimJoin(docs, 0.5)
      .collect().map(_.toSeq).toSet
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct().as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = (for {
      a <- toks.keys; b <- toks.keys if a < b
      ni = toks(a).intersect(toks(b)).size
      j = ni.toDouble / (toks(a).size + toks(b).size - ni) if j >= 0.5
    } yield Seq(a, b, math.rint(j * 1e6) / 1e6)).toSet
    assert(fast == brute && fast.nonEmpty,
      s"setsim mismatch: fast=${fast.size} brute=${brute.size}")
  }

  test("simhashHammingPairs equals the brute-force quadratic scan") {
    val docs = graft.Tables.documents(spark, sf).filter(col("doc_id") < 200)
    val fast = DedupQueries.simhashHammingPairs(docs)
      .collect().map(_.toSeq).toSet
    val sigs = DedupQueries.simhashOf(docs).as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      hd = java.lang.Long.bitCount(sa ^ sb) if hd <= DedupQueries.HammingMax
    } yield Seq(a, b, hd.toLong)).toSet
    assert(fast == brute && fast.nonEmpty,
      s"hamming mismatch: fast=${fast.size} brute=${brute.size}")
  }

  test("star contraction preserves candidate-graph connectivity exactly") {
    // CC over the linear star-edge graph must equal CC over the full
    // O(bucket²) pairwise candidate expansion (no est filter on either
    // side — the contraction claim is about connectivity).
    val docs = graft.Tables.documents(spark, sf)
    val sig = DedupQueries.minhashSignaturesOf(docs).localCheckpoint()
    val starComp = graft.grid.Topology.graphComponents(
        DedupQueries.starEdges(sig))
      .as[(Long, Long)].collect().toMap
    val pairComp = graft.grid.Topology.graphComponents(
        DedupQueries.minhashCandidatesFrom(sig)
          .select(col("doc_a").as("s"), col("doc_b").as("t")))
      .as[(Long, Long)].collect().toMap
    assert(starComp.nonEmpty && starComp == pairComp,
      s"star=${starComp.size} pair=${pairComp.size}")
  }

  test("dupNgramStats: unique corpus has zero dup, doubled doc is fully dup") {
    val w = 3
    // 3 docs of globally-unique tokens + one exact copy of doc 0
    val docs = Seq(
      (0L, "a b c d e f"), (1L, "g h i j k l"), (2L, "m n o p q r"),
      (3L, "a b c d e f"),
      (4L, "s t")) // shorter than w: zero windows
      .toDF("doc_id", "text")
    val rows = DedupQueries.dupNgramStats(docs, w).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1) == ((4L, 0L, 0.0)) && rows(2) == ((4L, 0L, 0.0)))
    assert(rows(0) == ((4L, 4L, 1.0)) && rows(3) == ((4L, 4L, 1.0)),
      "every window of a doc with an exact twin is duplicated")
    assert(rows(4) == ((0L, 0L, 0.0)), "sub-window doc has no windows")
  }

  test("per-row HOF simhash is bit-identical to the explode+groupBy path") {
    val docs = graft.Tables.documents(spark, sf)
    val agg = DedupQueries.simhashOf(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = DedupQueries.simhashPerRow(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow == agg)
  }

  test("per-row HOF signatures are bit-identical to the explode+groupBy path") {
    val docs = graft.Tables.documents(spark, sf)
    val agg = DedupQueries.minhashSignaturesOf(docs)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val perRow = DedupQueries.signaturesPerRow(docs)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(perRow.keySet == agg.keySet)
    perRow.foreach { case (id, sig) =>
      assert(sig == agg(id), s"doc $id signature diverges")
    }
  }
}
