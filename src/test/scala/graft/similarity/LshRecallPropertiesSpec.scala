package graft.similarity

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the q38 multi-probe sign-LSH pipeline — the
  * md5-parity hyperplanes, the quantized integer bit sums, the bucket
  * bit-packing (1L << b), the any-shared-table candidate rule, the
  * exact re-rank with its (cos desc, vec_id) tie-break, and the
  * per-probe recall bookkeeping. A driver-side reference — md5 parity
  * recomputed from the documented "t|b|i" rule, plain loops and sorts
  * — runs the identical geometry on random clustered corpora
  * (including exact duplicate vectors, which land in identical buckets
  * and tie every cosine) and is compared row-for-row.
  *
  * Components are generated as k/64 floats, so quantization
  * (k/64 * 2^20 = k * 2^14) and every cosine sum are EXACT — the 6-dp
  * comparison is deterministic, not probabilistic.
  */
class LshRecallPropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(911L + i)))

  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def r(x: Double, s: Int): Double =
    BigDecimal.valueOf(x)
      .setScale(s, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Independent reimplementation of the documented hyperplane rule:
    * parity of the first 60 bits of md5("t|b|i").
    */
  private def sign(t: Int, b: Int, i: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$t|$b|$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
  }

  private case class Corpus(vecs: Vector[Vector[Float]])

  /** 64-dim corpora (the LSH geometry is fixed at Dim): a handful of
    * prototypes, one jittered component each, exact duplicates when
    * the jitter is 0.
    */
  private val corpusGen: Gen[Corpus] = for {
    nProto <- Gen.choose(2, 5)
    protos <- Gen.listOfN(nProto,
      Gen.listOfN(SimilarityQueries.Dim, Gen.choose(-32, 32)))
    n <- Gen.choose(30, 60)
    picks <- Gen.listOfN(n, Gen.choose(0, nProto - 1))
    jitters <- Gen.listOfN(n, for {
      j <- Gen.choose(0, SimilarityQueries.Dim - 1)
      dv <- Gen.choose(-2, 2)
    } yield (j, dv))
  } yield Corpus(picks.zip(jitters).map { case (p, (j, dv)) =>
    val base = protos(p).toVector
    val v = base.updated(j, base(j) + dv)
    val nz = if (v.forall(_ == 0)) v.updated(0, 1) else v
    nz.map(x => (x / 64.0).toFloat)
  }.toVector)

  /** The reference: (probe_id, rnk, nbr_id, cos_sim, n_candidates,
    * hits, recall_at_10) rows, ordered (probe, rnk).
    */
  private def reference(c: Corpus): Seq[(Long, Long, Long, Double,
      Long, Long, Double)] = {
    import SimilarityQueries.{AnnNProbes, Dim, LshBits, LshTables,
      QuantScale}
    val n = c.vecs.length
    val q: Vector[Vector[Long]] = c.vecs.map(_.map(v =>
      math.floor(v.toDouble * QuantScale + 0.5).toLong))
    def bucket(vid: Int, t: Int): Long =
      (0 until LshBits).map { b =>
        val bs = (0 until Dim).map(i => q(vid)(i) * sign(t, b, i)).sum
        if (bs > 0) 1L << b else 0L
      }.sum
    val buckets: Vector[Vector[Long]] =
      Vector.tabulate(n, LshTables)((vid, t) => bucket(vid, t))
    def cos(p: Int, v: Int): Double = {
      var dot = 0.0; var nrm = 0.0; var qn = 0.0; var i = 0
      while (i < Dim) {
        dot += c.vecs(v)(i).toDouble * c.vecs(p)(i).toDouble
        nrm += c.vecs(v)(i).toDouble * c.vecs(v)(i).toDouble
        qn += c.vecs(p)(i).toDouble * c.vecs(p)(i).toDouble
        i += 1
      }
      r(dot / (math.sqrt(nrm) * math.sqrt(qn)), 6)
    }
    (0 until math.min(AnnNProbes, n)).flatMap { p =>
      val cand = (0 until n).filter(v => v != p &&
        (0 until LshTables).exists(t => buckets(v)(t) == buckets(p)(t)))
      if (cand.isEmpty) Nil
      else {
        val exactK = (0 until n).filter(_ != p)
          .sortBy(v => (-cos(p, v), v)).take(10)
        val hits = exactK.count(cand.toSet).toLong
        val recall = r(hits / 10.0, 4)
        cand.sortBy(v => (-cos(p, v), v)).take(10).zipWithIndex.map {
          case (v, ix) =>
            (p.toLong, (ix + 1).toLong, v.toLong, cos(p, v),
              cand.size.toLong, hits, recall)
        }
      }
    }
  }

  test("annLshRecallOf == the driver-side reference on random " +
      "clustered corpora (hyperplane parity, bucket packing, " +
      "any-shared-table candidates, exact re-rank, recall)") {
    samples(corpusGen, 3).zipWithIndex.foreach { case (c, ci) =>
      val emb = c.vecs.zipWithIndex
        .map { case (v, id) => (id.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val got = SimilarityQueries.annLshRecallOf(emb).collect()
        .map(row => (row.getAs[Long]("probe_id"), row.getAs[Long]("rnk"),
          row.getAs[Long]("nbr_id"), row.getAs[Double]("cos_sim"),
          row.getAs[Long]("n_candidates"), row.getAs[Long]("hits"),
          row.getAs[Double]("recall_at_10")))
        .toSeq.sortBy(x => (x._1, x._2))
      val want = reference(c)
      assert(got == want,
        s"corpus $ci (n=${c.vecs.length}):\n  got  ${got.take(5)}...\n" +
          s"  want ${want.take(5)}...")
      graft.CacheScope.flush(spark)
    }
  }
}
