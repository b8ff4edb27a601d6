package graft.similarity

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the q178 IVF-PQ core — coarse integer centroids,
  * residual codebooks, subspace encode argmins, per-probe list picks,
  * and the ADC table-lookup ranking — against an INDEPENDENT
  * driver-side reference (plain loops over exact 64-bit integers)
  * running the identical pipeline on the real corpus. The FULL ordered
  * candidate list of EVERY probe is compared, so a centroid rounding,
  * residual, codebook, encode tie-break, table, or ranking bug
  * reorders or replaces candidates and fails loudly. Because every
  * compared quantity is an exact integer, there is no tolerance
  * anywhere.
  */
class IvfPqPropertiesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = "/root/testdata/sf0.001"

  import SimilarityQueries.{KmScale, IvfPqNProbe, PqSubDim, PqNCand,
    AnnNProbes}

  private def r6(x: Double): Double =
    BigDecimal.valueOf(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (vec_id, label, components) collected once. */
  private lazy val corpus: Vector[(Long, Int, Array[Double])] =
    graft.Tables.embeddings(spark, sf)
      .collect()
      .map(r => (r.getLong(0),
        r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1).toVector

  /** The reference: the whole integer IVF-PQ chain in plain loops —
    * per probe, the ordered (vec_id, adist) candidate list.
    */
  private def referenceCandidates(): Map[Long, Seq[(Long, Long)]] = {
    val q: Map[Long, Array[Long]] = corpus.map { case (id, _, v) =>
      id -> v.map(x => math.floor(x * KmScale + 0.5).toLong)
    }.toMap
    val dim = corpus.head._3.length
    val labels = corpus.map(_._2).distinct.sorted
    def intMean(xs: Seq[Long]): Long =
      math.floor(xs.sum.toDouble / xs.size + 0.5).toLong
    // coarse centroids per label
    val cent: Map[Int, Array[Long]] = labels.map { l =>
      val members = corpus.filter(_._2 == l).map(c => q(c._1))
      l -> Array.tabulate(dim)(i => intMean(members.map(_(i))))
    }.toMap
    def d2(v: Array[Long], c: Array[Long]): Long =
      (0 until dim).map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
    val lst: Map[Long, Int] = corpus.map { case (id, _, _) =>
      id -> labels.map(l => (d2(q(id), cent(l)), l)).min._2
    }.toMap
    // residuals and per-(subspace, label) codewords
    val res: Map[Long, Array[Long]] = corpus.map { case (id, _, _) =>
      id -> Array.tabulate(dim)(i => q(id)(i) - cent(lst(id))(i))
    }.toMap
    val nSub = dim / PqSubDim
    val cb: Map[(Int, Int), Array[Long]] = (for {
      m <- 0 until nSub; l <- labels
    } yield {
      val members = corpus.filter(_._2 == l).map(c => res(c._1))
      (m, l) -> Array.tabulate(PqSubDim)(j =>
        intMean(members.map(_(m * PqSubDim + j))))
    }).toMap
    def subD2(r: Array[Long], m: Int, cw: Array[Long]): Long =
      (0 until PqSubDim).map { j =>
        val d = r(m * PqSubDim + j) - cw(j); d * d
      }.sum
    val code: Map[(Long, Int), Int] = (for {
      (id, _, _) <- corpus; m <- 0 until nSub
    } yield (id, m) ->
      labels.map(l => (subD2(res(id), m, cb((m, l))), l)).min._2).toMap
    (0L until AnnNProbes).map { p =>
      val pl = labels.map(l => (d2(q(p), cent(l)), l)).sorted
        .take(IvfPqNProbe).map(_._2)
      val td: Map[(Int, Int, Int), Long] = (for {
        l <- pl; m <- 0 until nSub; cl <- labels
      } yield {
        val qr = Array.tabulate(dim)(i => q(p)(i) - cent(l)(i))
        (l, m, cl) -> subD2(qr, m, cb((m, cl)))
      }).toMap
      val cand = corpus
        .filter(c => c._1 != p && pl.contains(lst(c._1)))
        .map { case (id, _, _) =>
          (id, (0 until nSub).map(m => td((lst(id), m, code((id, m))))).sum)
        }
      p -> cand.sortBy { case (id, ad) => (ad, id) }.take(PqNCand)
    }.toMap
  }

  test("q178 IVF-PQ: every probe's full ordered ADC candidate list " +
    "equals the independent integer reference, and the per-probe " +
    "summary rows are consistent with brute-force recall recounts") {
    val f = graft.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.posexplode(
          org.apache.spark.sql.functions.col("embedding"))
          .as(Seq("i", "v")))
      .withColumn("v",
        org.apache.spark.sql.functions.col("v").cast("double"))
    val got = SimilarityQueries.ivfPqCandidatesOf(f).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (p, rows) => p -> rows.map(r => (r._2, r._3)).toSeq }
    val ref = referenceCandidates()
    assert(got.keySet == ref.keySet,
      s"probe set diverged: ${got.keySet} vs ${ref.keySet}")
    ref.foreach { case (p, want) =>
      assert(got(p) == want,
        s"probe $p candidate list diverged: got ${got(p).take(3)}... " +
          s"vs ${want.take(3)}...")
    }

    // summary: per probe, hits == |exact-L2 top-10 ∩ candidates|
    val rows = SimilarityQueries.ivfPqRecallOf(f).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (0L until AnnNProbes).toSeq)
    var totalHits = 0L
    rows.foreach { case (p, nCand, hits, recall) =>
      val candSet = ref(p).map(_._1).toSet
      assert(nCand == ref(p).length.toLong)
      val qp = corpus.find(_._1 == p).get._3
      val top10 = corpus.filter(_._1 != p).map { case (id, _, v) =>
        (id, r6((0 until v.length).map { i =>
          val d = v(i) - qp(i); d * d
        }.sum))
      }.sortBy { case (id, l2) => (l2, id) }.take(10).map(_._1)
      val expHits = top10.count(candSet)
      assert(hits == expHits.toLong,
        s"probe $p hits $hits != brute-force $expHits")
      assert(recall == r6(expHits / 10.0))
      totalHits += hits
    }
    // the composed index must be genuinely useful on this corpus: the
    // 10-probe aggregate recall clears 40% even though this corpus is
    // weakly L2-clustered (see IvfPqNProbe's scaladoc)
    assert(totalHits >= 4L * AnnNProbes,
      s"IVF-PQ aggregate recall collapsed: $totalHits/${10 * AnnNProbes}")

    // degenerate: an empty corpus yields an empty summary, not an error
    import spark.implicits._
    val emptyFlat = Seq.empty[(Long, Int, Int, Double)]
      .toDF("vec_id", "label", "i", "v")
    assert(SimilarityQueries.ivfPqRecallOf(emptyFlat).collect().isEmpty)
  }
}
