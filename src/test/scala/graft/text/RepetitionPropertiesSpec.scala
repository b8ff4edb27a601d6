package graft.text

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the q158 Gopher repetition core — the codegen'd
  * lead-context window stream, the lex-largest top-gram tie-break, the
  * hash-identity dup counting, the gaps-and-islands coverage union
  * priced off prefix sums, and the doc_id-derived line/paragraph
  * machinery each have edge cases (sub-window docs, empty tokens from
  * double spaces, runs like "a a a a" where every window overlaps,
  * short final lines/paragraphs) that fixtures can miss. A driver-side
  * reference implementation — explicit window lists, position-set
  * unions, plain string counting — runs on random small-vocab corpora
  * (small vocab forces dense within-doc repeats) and is compared
  * doc-for-doc, signal-for-signal against the distributed plan.
  */
class RepetitionPropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(197L + i)))

  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Spark's round(col, 4) on doubles: HALF_UP via BigDecimal.valueOf. */
  private def r4(x: Double): Double =
    BigDecimal.valueOf(x)
      .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference n-gram half: doc -> (top_2..top_4, dup_5..dup_10, keep). */
  private def refNgram(text: String): (Seq[Double], Boolean) = {
    // mirror Spark's split(text, " "): limit -1, trailing empties kept
    val toks = text.split(" ", -1).toVector
    val tot = math.max(text.replace(" ", "").length, 1).toLong
    val fracs = (2 to 10).map { n =>
      val occ = (1 to toks.length - n + 1)
        .map(p => p -> toks.slice(p - 1, p - 1 + n))
      val cnts = occ.groupBy(_._2.mkString(" "))
        .map { case (g, os) => g -> os.size.toLong }
      val repChars: Long =
        if (cnts.isEmpty) 0L
        else if (n <= 4) {
          // max count, ties to the lexicographically LARGEST gram
          val (g, c) = cnts.maxBy { case (g, c) => (c, g) }
          c * (g.length - (n - 1))
        } else {
          val dup = cnts.filter(_._2 >= 2).keySet
          val covered = occ.collect {
            case (p, w) if dup(w.mkString(" ")) => p until p + n
          }.flatten.toSet
          covered.toSeq.map(p => toks(p - 1).length.toLong).sum
        }
      r4(repChars.toDouble / tot)
    }
    val keep = (2 to 10).zip(fracs).forall { case (n, f) =>
      f <= TextQueries.RepThreshold(n)
    }
    (fracs, keep)
  }

  /** Reference line/paragraph half: (doc_id, text) ->
    * (dup_line_frac, dup_para_frac, keep_line).
    */
  private def refLine(id: Long, text: String): (Double, Double, Boolean) = {
    val toks = text.split(" ", -1).toVector
    val L = (3 + id % 5).toInt
    val P = (2 + id % 3).toInt
    val nlines = math.ceil(toks.length / L.toDouble).toInt
    val raw = (0 until nlines)
      .map(j => toks.slice(j * L, j * L + L).mkString(" "))
    val lines =
      if (id % TextQueries.RepAugLineEvery == 0) {
        val ls = raw.take(P)
        raw ++ ls ++ ls ++ ls
      } else raw
    val nparas = math.ceil(lines.length / P.toDouble).toInt
    val paras = (0 until nparas)
      .map(k => lines.slice(k * P, k * P + P).mkString("\n"))
    def dupFrac(xs: Seq[String]): Double = {
      val byText = xs.groupBy(identity).map { case (_, g) => g.size.toLong }
      r4(byText.filter(_ >= 2).sum.toDouble / byText.sum)
    }
    val (dl, dp) = (dupFrac(lines), dupFrac(paras))
    (dl, dp, dl <= TextQueries.RepLineThreshold
      && dp <= TextQueries.RepParaThreshold)
  }

  // small vocab (incl. a length-1 and a length-3 token) forces dense
  // within-doc repeats across every n; empty docs, single-token docs,
  // and run-heavy docs are planted explicitly below
  private val tokenGen = Gen.oneOf("a", "bb", "ccc", "dd", "e", "fff")
  private val docGen: Gen[String] = for {
    len <- Gen.choose(0, 45)
    toks <- Gen.listOfN(len, tokenGen)
  } yield toks.mkString(" ")

  test("random corpora: Spark signals == reference, doc for doc") {
    val planted = Seq(
      0L -> "", // empty text -> one empty token, tot clamped to 1
      1L -> "a", // sub-window for every n
      6L -> Seq.fill(30)("a").mkString(" "), // run: all windows overlap
      12L -> (1 to 11).map(i => s"t$i").mkString(" "), // all distinct
      24L -> "a bb  ccc a bb  ccc a bb", // double spaces -> empty tokens
      30L -> ((1 to 9) ++ (1 to 9) ++ (1 to 9)).map(i => s"w$i")
        .mkString(" ")) // period-9 cycle: every n dups via period shifts
    val randoms = samples(docGen, 40).zipWithIndex
      .map { case (t, i) => (100L + i * 7, t) } // ids sweep %4 %5 %6 %3
    val docs = planted ++ randoms
    val df = docs.toDF("doc_id", "text")

    val gotN = TextQueries.repetitionSignalsOf(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val gotL = TextQueries.lineRepetitionSignalsOf(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(gotN.size == docs.size && gotL.size == docs.size)

    docs.foreach { case (id, text) =>
      val (fracs, keep) = refNgram(text)
      val row = gotN(id)
      (2 to 10).zip(fracs).foreach { case (n, want) =>
        val colName = if (n <= 4) s"top_${n}_frac" else s"dup_${n}_frac"
        assert(row.getAs[Double](colName) == want,
          s"doc $id $colName: got ${row.getAs[Double](colName)}, " +
            s"want $want (text='$text')")
      }
      assert(row.getAs[Boolean]("keep_ngram") == keep, s"doc $id keep_ngram")
      val (dl, dp, keepL) = refLine(id, text)
      val lrow = gotL(id)
      assert(lrow.getAs[Double]("dup_line_frac") == dl,
        s"doc $id dup_line_frac (text='$text')")
      assert(lrow.getAs[Double]("dup_para_frac") == dp,
        s"doc $id dup_para_frac (text='$text')")
      assert(lrow.getAs[Boolean]("keep_line") == keepL, s"doc $id keep_line")
    }
    graft.CacheScope.flush(spark)
  }

  test("full gate == reference composed over the augmented corpus") {
    val docs = samples(docGen, 24).zipWithIndex
      .map { case (t, i) => (i.toLong, t) } // consecutive ids: every
    val df = docs.toDF("doc_id", "text")    // augmentation cadence fires
    val got = TextQueries.repetitionGate(
      TextQueries.repetitionAugmented(df)).collect()
      .map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text) =>
      // the gate runs BOTH halves over the self-repeat-augmented text
      val toks = text.split(" ", -1).toVector
      val augText =
        if (id % TextQueries.RepAugSelfEvery == 0)
          text + " " + toks.take(TextQueries.RepAugSelfK).mkString(" ")
        else text
      val (fracs, keepN) = refNgram(augText)
      val (dl, dp, keepL) = refLine(id, augText)
      val row = got(id)
      (2 to 10).zip(fracs).foreach { case (n, want) =>
        val colName = if (n <= 4) s"top_${n}_frac" else s"dup_${n}_frac"
        assert(row.getAs[Double](colName) == want, s"doc $id $colName")
      }
      assert(row.getAs[Double]("dup_line_frac") == dl, s"doc $id line")
      assert(row.getAs[Double]("dup_para_frac") == dp, s"doc $id para")
      assert(row.getAs[Boolean]("keep_repetition") == (keepN && keepL),
        s"doc $id keep_repetition")
    }
    graft.CacheScope.flush(spark)
  }
}
