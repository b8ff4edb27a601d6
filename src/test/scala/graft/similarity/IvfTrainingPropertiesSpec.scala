package graft.similarity

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the q46 in-query integer-Lloyd trainer — the
  * md5-ordered seeding, the exact-integer distance argmins with their
  * (d2, cid) tie-break, the floor(sum/count + 0.5) centroid update,
  * empty-cluster disappearance, nprobe list ranking, and the recall
  * bookkeeping each have edge cases a fixed corpus can miss (exact
  * duplicate vectors tying every distance, clusters collapsing to one
  * member, a probe whose lists hold only itself). A driver-side
  * reference implementation — plain Maps and sorts, no Spark — runs
  * the identical algorithm on random clustered corpora and is compared
  * probe-for-probe against the distributed plan.
  *
  * Values are generated as k/64 with small integer k, so every Spark
  * double sum in the cosine leg is EXACT (all terms are multiples of
  * 1/4096 with small magnitude) — order-of-addition cannot move the
  * 6-dp rounded score, making the comparison deterministic rather than
  * probabilistic.
  */
class IvfTrainingPropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(641L + i)))

  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Spark's round(col, s) on doubles: HALF_UP via BigDecimal.valueOf. */
  private def r(x: Double, s: Int): Double =
    BigDecimal.valueOf(x)
      .setScale(s, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private case class Corpus(dim: Int, vecs: Vector[Vector[Double]])

  /** Clustered corpora: a handful of integer prototypes, each vector a
    * prototype with one jittered component (jitter 0 yields EXACT
    * duplicates — the all-distances-tie case), components k/64.
    */
  private val corpusGen: Gen[Corpus] = for {
    dim <- Gen.choose(4, 12)
    nProto <- Gen.choose(2, 5)
    protos <- Gen.listOfN(nProto,
      Gen.listOfN(dim, Gen.choose(-32, 32)))
    n <- Gen.choose(30, 70)
    picks <- Gen.listOfN(n, Gen.choose(0, nProto - 1))
    jitters <- Gen.listOfN(n, for {
      j <- Gen.choose(0, dim - 1)
      dv <- Gen.choose(-2, 2)
    } yield (j, dv))
  } yield {
    val vecs = picks.zip(jitters).map { case (p, (j, dv)) =>
      val base = protos(p).toVector
      val v = base.updated(j, base(j) + dv)
      // a zero vector has undefined cosine; both engines would emit
      // NaN — keep the domain where the operator is defined
      val nz = if (v.forall(_ == 0)) v.updated(0, 1) else v
      nz.map(_ / 64.0)
    }.toVector
    Corpus(dim, vecs)
  }

  /** The reference: the q46 algorithm in plain Scala on the driver.
    * Returns (probe_id, n_candidates, hits, recall_at_10) rows for
    * probes with a nonempty candidate set, ordered by probe.
    */
  private def reference(c: Corpus): Seq[(Long, Long, Long, Double)] = {
    import SimilarityQueries.{AnnNProbes, KmIters, KmK, KmNProbe, KmScale}
    val n = c.vecs.length
    val q: Vector[Vector[Long]] =
      c.vecs.map(_.map(v => math.floor(v * KmScale + 0.5).toLong))
    val seeds = (0L until n.toLong)
      .sortBy(id => (md5hex(id.toString), id)).take(KmK)
    var cent: Map[Int, Vector[Long]] =
      seeds.zipWithIndex.map { case (id, ix) =>
        (ix + 1) -> q(id.toInt)
      }.toMap
    def d2(vid: Int, cid: Int): Long = {
      val cc = cent(cid)
      var s = 0L; var i = 0
      while (i < c.dim) { val d = q(vid)(i) - cc(i); s += d * d; i += 1 }
      s
    }
    def assign(): Map[Int, Int] =
      (0 until n).map { vid =>
        vid -> cent.keys.toSeq.map(cid => (d2(vid, cid), cid)).min._2
      }.toMap
    for (_ <- 1 to KmIters) {
      val asg = assign()
      // a cluster that loses all members vanishes (no rows to group)
      cent = asg.groupBy(_._2).map { case (cid, members) =>
        // members.keys is a Set — map through a Seq or equal q values
        // collapse before the sum (two members with identical
        // components must both count)
        val vids = members.keys.toSeq
        cid -> (0 until c.dim).map { i =>
          val s = vids.map(v => q(v)(i)).sum
          math.floor(s.toDouble / vids.size + 0.5).toLong
        }.toVector
      }
    }
    val asgF = assign()
    val nProbes = AnnNProbes
    val plists: Map[Int, Set[Int]] = (0 until nProbes).map { p =>
      p -> cent.keys.toSeq.map(cid => (d2(p, cid), cid))
        .sorted.take(KmNProbe).map(_._2).toSet
    }.toMap
    def cos(p: Int, v: Int): Double = {
      var dot = 0.0; var nrm = 0.0; var qn = 0.0; var i = 0
      while (i < c.dim) {
        dot += c.vecs(v)(i) * c.vecs(p)(i)
        nrm += c.vecs(v)(i) * c.vecs(v)(i)
        qn += c.vecs(p)(i) * c.vecs(p)(i)
        i += 1
      }
      r(dot / (math.sqrt(nrm) * math.sqrt(qn)), 6)
    }
    (0 until nProbes).flatMap { p =>
      val cand = (0 until n)
        .filter(v => v != p && plists(p)(asgF(v))).toSet
      if (cand.isEmpty) None
      else {
        val exactK = (0 until n).filter(_ != p)
          .sortBy(v => (-cos(p, v), v)).take(10)
        val hits = exactK.count(cand)
        Some((p.toLong, cand.size.toLong, hits.toLong,
          r(hits / 10.0, 4)))
      }
    }
  }

  test("annIvfRecallOf == the driver-side reference on random " +
      "clustered corpora (seeding, argmin tie-breaks, centroid " +
      "rounding, empty clusters, nprobe lists, recall bookkeeping)") {
    samples(corpusGen, 4).zipWithIndex.foreach { case (c, ci) =>
      val flat = c.vecs.zipWithIndex.flatMap { case (v, id) =>
        v.zipWithIndex.map { case (x, i) => (id.toLong, i, x) }
      }.toDF("vec_id", "i", "v")
      val got = SimilarityQueries.annIvfRecallOf(flat).collect()
        .map(row => (row.getAs[Long]("probe_id"),
          row.getAs[Long]("n_candidates"), row.getAs[Long]("hits"),
          row.getAs[Double]("recall_at_10")))
        .toSeq.sortBy(_._1)
      val want = reference(c)
      assert(got == want,
        s"corpus $ci (dim=${c.dim}, n=${c.vecs.length}):\n" +
          s"  got  $got\n  want $want")
      graft.CacheScope.flush(spark)
    }
  }
}
