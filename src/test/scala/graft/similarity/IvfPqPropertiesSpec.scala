package graft.similarity

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the q178 IVF-PQ core — coarse integer centroids,
  * residual codebooks, subspace encode argmins, probe-list pick, and
  * the ADC table-lookup ranking — against an INDEPENDENT driver-side
  * reference (plain loops over exact 64-bit integers) running the
  * identical pipeline on the real corpus. The FULL ordered candidate
  * list is compared, so a centroid rounding, residual, codebook,
  * encode tie-break, table, or ranking bug reorders or replaces
  * candidates and fails loudly. Because every compared quantity is an
  * exact integer, there is no tolerance anywhere.
  */
class IvfPqPropertiesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = "/root/testdata/sf0.001"

  import SimilarityQueries.{KmScale, IvfPqNProbe, PqSubDim, PqNCand}

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

  /** The reference: the whole integer IVF-PQ chain in plain loops. */
  private def referenceCandidates(): Seq[(Long, Long)] = {
    val q: Map[Long, Array[Long]] = corpus.map { case (id, _, v) =>
      id -> v.map(x => math.floor(x * KmScale + 0.5).toLong)
    }.toMap
    val labelOf: Map[Long, Int] = corpus.map(c => c._1 -> c._2).toMap
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
    // probe lists + ADC tables
    val pl = labels.map(l => (d2(q(0L), cent(l)), l)).sorted
      .take(IvfPqNProbe).map(_._2)
    val td: Map[(Int, Int, Int), Long] = (for {
      l <- pl; m <- 0 until nSub; cl <- labels
    } yield {
      val qr = Array.tabulate(dim)(i => q(0L)(i) - cent(l)(i))
      (l, m, cl) -> subD2(qr, m, cb((m, cl)))
    }).toMap
    val cand = corpus.filter(c => c._1 != 0L && pl.contains(lst(c._1)))
      .map { case (id, _, _) =>
        (id, (0 until nSub).map(m => td((lst(id), m, code((id, m))))).sum)
      }
    cand.sortBy { case (id, ad) => (ad, id) }.take(PqNCand)
      .map { case (id, ad) => (id, ad) }
  }

  test("q178 IVF-PQ: the full ordered ADC candidate list equals the " +
    "independent integer reference, and the declared summary row is " +
    "consistent with a brute-force recall recount") {
    val f = graft.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.posexplode(
          org.apache.spark.sql.functions.col("embedding"))
          .as(Seq("i", "v")))
      .withColumn("v",
        org.apache.spark.sql.functions.col("v").cast("double"))
    val got = SimilarityQueries.ivfPqCandidatesOf(f).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ref = referenceCandidates()
    assert(got == ref,
      s"candidate list diverged: got ${got.take(5)}... vs ${ref.take(5)}...")

    // summary: hits == |exact-L2 top-10 ∩ candidates| recomputed here
    val candSet = ref.map(_._1).toSet
    val q0 = corpus.find(_._1 == 0L).get._3
    val top10 = corpus.filter(_._1 != 0L).map { case (id, _, v) =>
      (id, r6((0 until v.length).map { i =>
        val d = v(i) - q0(i); d * d
      }.sum))
    }.sortBy { case (id, l2) => (l2, id) }.take(10).map(_._1)
    val expHits = top10.count(candSet)
    val row = SimilarityQueries.ivfPqRecallOf(f).collect()
    assert(row.length == 1)
    assert(row(0).getLong(0) == ref.length.toLong)
    assert(row(0).getLong(1) == expHits.toLong,
      s"hits ${row(0).getLong(1)} != brute-force $expHits")
    assert(row(0).getDouble(2) == r6(expHits / 10.0))
    // degenerate: an empty corpus yields the zero summary, not an error
    import spark.implicits._
    val emptyFlat = Seq.empty[(Long, Int, Int, Double)]
      .toDF("vec_id", "label", "i", "v")
    val z = SimilarityQueries.ivfPqRecallOf(emptyFlat).collect()
    assert(z.length == 1 && z(0).getLong(0) == 0L && z(0).getLong(1) == 0L)

    // the composed index must be genuinely useful on this corpus.
    // This corpus is weakly L2-clustered (the exact top-10 spans 8 of
    // 10 coarse lists — see IvfPqNProbe's scaladoc), so 4 probed
    // lists reach 4/10 at sf0.001; the recall twin measures that IVF
    // loss honestly rather than hiding it.
    assert(expHits >= 4, s"IVF-PQ recall collapsed: $expHits/10")
  }
}
