package graft.similarity

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the q121 product-quantization / ADC core — the
  * per-label subspace codebooks, the per-(vector, subspace) encode
  * argmin with its (d2, label) tie-break, the probe's distance table,
  * and the table-lookup candidate ranking. A driver-side reference
  * (plain loops over exact arithmetic) runs the identical pipeline on
  * random labeled corpora and the FULL ordered candidate list is
  * compared — a codebook, encode, table, or ranking bug reorders or
  * replaces candidates.
  *
  * Exactness discipline: components are k/64 and every label has
  * EXACTLY 8 members, so the codebook means (sum / 8), the subspace
  * distances (multiples of 1/2^18), and the ADC sums are all exact in
  * double — argmins and the 6-dp rounding cannot flip on
  * summation-order ULPs.
  */
class PqAdcPropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(733L + i)))

  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal.valueOf(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  private case class Corpus(dim: Int,
      rows: Vector[(Long, Vector[Double])]) // (label, components)

  /** 7-9 labels x exactly 8 members, dim a multiple of PqSubDim;
    * members jitter one component of the label prototype (jitter 0
    * yields exact duplicates — encode ties).
    */
  private val corpusGen: Gen[Corpus] = for {
    dim <- Gen.oneOf(8, 12)
    nLabels <- Gen.choose(7, 9)
    protos <- Gen.listOfN(nLabels, Gen.listOfN(dim, Gen.choose(-32, 32)))
    jitters <- Gen.listOfN(nLabels * 8, for {
      j <- Gen.choose(0, dim - 1)
      dv <- Gen.choose(-2, 2)
    } yield (j, dv))
  } yield {
    val rows = jitters.zipWithIndex.map { case ((j, dv), ix) =>
      val lbl = ix % nLabels // interleave labels across vec_ids
      val base = protos(lbl).toVector
      val v = base.updated(j, base(j) + dv)
      val nz = if (v.forall(_ == 0)) v.updated(0, 1) else v
      (lbl.toLong, nz.map(_ / 64.0))
    }.toVector
    Corpus(dim, rows)
  }

  /** The reference: ordered (vec_id, adist) candidates. */
  private def reference(c: Corpus): Seq[(Long, Double)] = {
    import SimilarityQueries.{PqNCand, PqSubDim}
    val n = c.rows.length
    val labels = c.rows.map(_._1).distinct.sorted
    val nSub = c.dim / PqSubDim
    // codebook: per (label, i) mean over that label's members
    val cb: Map[(Long, Int), Double] = labels.flatMap { l =>
      val members = c.rows.filter(_._1 == l).map(_._2)
      (0 until c.dim).map(i =>
        (l, i) -> members.map(_(i)).sum / members.size)
    }.toMap
    def d2(vid: Int, m: Int, cl: Long): Double =
      (m * PqSubDim until (m + 1) * PqSubDim).map { i =>
        val d = c.rows(vid)._2(i) - cb((cl, i)); d * d
      }.sum
    def code(vid: Int, m: Int): Long =
      labels.map(cl => (d2(vid, m, cl), cl)).min._2
    val qtab: Map[(Int, Long), Double] =
      (0 until nSub).flatMap(m =>
        labels.map(cl => (m, cl) -> d2(0, m, cl))).toMap
    (1 until n).map { vid =>
      vid.toLong -> r6((0 until nSub).map(m =>
        qtab((m, code(vid, m)))).sum)
    }.sortBy { case (vid, a) => (a, vid) }.take(PqNCand)
  }

  test("pqAdcCandidatesOf == the driver-side reference on random " +
      "labeled corpora (codebooks, encode argmin + tie-break, " +
      "distance table, ADC ranking)") {
    samples(corpusGen, 4).zipWithIndex.foreach { case (c, ci) =>
      val flat = c.rows.zipWithIndex.flatMap { case ((lbl, v), id) =>
        v.zipWithIndex.map { case (x, i) => (id.toLong, lbl, i, x) }
      }.toDF("vec_id", "label", "i", "v")
      val got = SimilarityQueries.pqAdcCandidatesOf(flat).collect()
        .map(row => (row.getAs[Long]("vec_id"),
          row.getAs[Double]("adist")))
        .toSeq.sortBy { case (vid, a) => (a, vid) }
      val want = reference(c)
      assert(got == want,
        s"corpus $ci (dim=${c.dim}, n=${c.rows.length}):\n" +
          s"  got  ${got.take(6)}...\n  want ${want.take(6)}...")
      graft.CacheScope.flush(spark)
    }
  }
}
