package graft.similarity

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the q116 batched kNN graph — the stride-seeded
  * cluster geometry, the multi-probe (d2, seed) ranking, the
  * shared-cluster candidate join with its va < vb half-pair dedup, the
  * native-expression cosine, the mirror union, and the per-vector
  * top-k window with its (cos desc, nbr asc) tie-break. A driver-side
  * reference — explicit probe sets, a plain pair scan, sorts — runs
  * the identical geometry on random clustered corpora spanning several
  * seed strides and the full ranked adjacency list is compared.
  *
  * Components are k/64 floats, so seed distances (the probe argmins)
  * and cosine sums are exact in double — deterministic comparisons.
  */
class KnnGraphPropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(379L + i)))

  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal.valueOf(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  private case class Corpus(dim: Int, vecs: Vector[Vector[Float]])

  /** 320-420 vectors (spans 4-5 seed strides at SemSeedStride = 100),
    * a handful of prototypes, one jittered component per vector.
    */
  private val corpusGen: Gen[Corpus] = for {
    dim <- Gen.oneOf(6, 8, 10)
    nProto <- Gen.choose(3, 6)
    protos <- Gen.listOfN(nProto, Gen.listOfN(dim, Gen.choose(-32, 32)))
    n <- Gen.choose(320, 420)
    picks <- Gen.listOfN(n, Gen.choose(0, nProto - 1))
    jitters <- Gen.listOfN(n, for {
      j <- Gen.choose(0, dim - 1)
      dv <- Gen.choose(-2, 2)
    } yield (j, dv))
  } yield Corpus(dim, picks.zip(jitters).map { case (p, (j, dv)) =>
    val base = protos(p).toVector
    val v = base.updated(j, base(j) + dv)
    val nz = if (v.forall(_ == 0)) v.updated(0, 1) else v
    nz.map(x => (x / 64.0).toFloat)
  }.toVector)

  /** The reference: ordered (vec_id, rnk, nbr_id, cos) rows. */
  private def reference(c: Corpus): Seq[(Long, Long, Long, Double)] = {
    import SimilarityQueries.{KnnK, SemNProbe, SemSeedStride}
    val n = c.vecs.length
    val d = c.vecs.map(_.map(_.toDouble))
    val seeds = (0 until n).filter(_ % SemSeedStride == 0)
    def d2(v: Int, s: Int): Double =
      (0 until c.dim).map { i => val x = d(v)(i) - d(s)(i); x * x }.sum
    val probes: Vector[Set[Int]] = Vector.tabulate(n)(v =>
      seeds.map(s => (d2(v, s), s)).sorted.take(SemNProbe)
        .map(_._2).toSet)
    def cos(a: Int, b: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < c.dim) {
        dot += d(a)(i) * d(b)(i); na += d(a)(i) * d(a)(i)
        nb += d(b)(i) * d(b)(i); i += 1
      }
      r6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val nbrs: Map[Int, Seq[Int]] = (0 until n).map { a =>
      a -> (0 until n).filter(b =>
        b != a && (probes(a) & probes(b)).nonEmpty)
    }.toMap
    (0 until n).flatMap { a =>
      nbrs(a).sortBy(b => (-cos(a, b), b)).take(KnnK).zipWithIndex
        .map { case (b, ix) =>
          (a.toLong, (ix + 1).toLong, b.toLong, cos(a, b))
        }
    }
  }

  test("knnGraphOf == the driver-side reference on random clustered " +
      "corpora (stride seeding, multi-probe ranking, shared-cluster " +
      "candidates, mirror, per-vector top-k tie-break)") {
    samples(corpusGen, 3).zipWithIndex.foreach { case (c, ci) =>
      val emb = c.vecs.zipWithIndex
        .map { case (v, id) => (id.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val got = SimilarityQueries.knnGraphOf(emb).collect()
        .map(row => (row.getAs[Long]("vec_id"), row.getAs[Long]("rnk"),
          row.getAs[Long]("nbr_id"), row.getAs[Double]("cos")))
        .toSeq.sortBy(x => (x._1, x._2))
      val want = reference(c)
      assert(got == want,
        s"corpus $ci (dim=${c.dim}, n=${c.vecs.length}): " +
          s"${got.size} vs ${want.size} rows\n" +
          s"  got  ${got.take(5)}...\n  want ${want.take(5)}...")
      graft.CacheScope.flush(spark)
    }
  }
}
