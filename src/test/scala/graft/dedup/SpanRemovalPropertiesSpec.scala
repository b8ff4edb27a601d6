package graft.dedup

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the q152 span-removal core — corpus-first
  * retention, gaps-and-islands span merging, and the reassembly fold
  * each have edge cases (intra-doc runs like "a a a a", adjacent and
  * overlapping removable windows, spans touching either doc boundary,
  * sub-window docs) that hand-picked fixtures can miss. A driver-side
  * reference implementation — explicit window lists, lexicographic-min
  * firsts, interval union, index-set token filtering — is run on
  * random small-vocab corpora (small vocab forces dense window
  * collisions) and compared doc-for-doc, field-for-field against the
  * distributed islands+fold pipeline.
  */
class SpanRemovalPropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(131L + i)))

  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Reference: (doc_id -> tokens) to the q152 row shape
    * (n_tokens, n_spans, n_removed, clean_text) per doc.
    */
  private def refSpanRemoval(docs: Seq[(Long, Vector[String])],
      w: Int): Map[Long, (Long, Long, Long, String)] = {
    // every window occurrence, its content, and the corpus-first
    // occurrence of each content by (doc_id, pos)
    val occ = for {
      (id, toks) <- docs
      p <- 0 to toks.length - w
    } yield (id, p, toks.slice(p, p + w).mkString(" "))
    val first = occ.groupBy(_._3).map { case (g, os) =>
      g -> os.map(o => (o._1, o._2)).min
    }
    val removable = occ.filter(o => first(o._3) != ((o._1, o._2)))
      .groupBy(_._1).map { case (id, os) => id -> os.map(_._2).sorted }
    docs.map { case (id, toks) =>
      id -> refClean(toks, removable.getOrElse(id, Seq.empty), w)
    }.toMap
  }

  /** Reference islands + reassembly for ONE doc given its sorted
    * removable window starts.
    */
  private def refClean(toks: Vector[String], rem: Seq[Int],
      w: Int): (Long, Long, Long, String) = {
    // interval union of [p, p+w) over removable starts
    val spans = rem.foldLeft(Vector.empty[(Int, Int)]) { case (acc, p) =>
      acc.lastOption match {
        case Some((s, e)) if p <= e => acc.init :+ ((s, math.max(e, p + w)))
        case _ => acc :+ ((p, p + w))
      }
    }
    val cut = spans.flatMap { case (s, e) => s until e }.toSet
    val clean = toks.zipWithIndex.collect {
      case (t, i) if !cut.contains(i) => t
    }.mkString(" ")
    (toks.length.toLong, spans.length.toLong,
      spans.map { case (s, e) => e - s }.sum.toLong, clean)
  }

  test("random small-vocab corpora: distributed span removal matches the " +
      "reference doc for doc") {
    val w = 3
    val corpusGen = for {
      nDocs <- Gen.choose(1, 8)
      docs <- Gen.sequence[Vector[Vector[String]], Vector[String]](
        Vector.fill(nDocs)(for {
          len <- Gen.choose(0, 14)
          toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
        } yield toks.toVector))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val corpora = samples(corpusGen, 40)
    assert(corpora.size >= 35, "generator must produce most samples")
    corpora.foreach { corpus =>
      val df = corpus.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = DedupQueries.dupSpanRemoval(df, w).collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))).toMap
      // split("", " ") tokenizes the empty text to one empty token —
      // the engine-side n_tokens for an empty doc is 1, the reference
      // counts 0; normalize the reference to the engine's convention
      val want = refSpanRemoval(corpus, w).map { case (id, (n, s, rm, c)) =>
        id -> ((math.max(n, 1L), s, rm, c))
      }
      assert(got == want,
        s"mismatch on corpus ${corpus.map(_._2.mkString(" "))}: " +
          s"got=$got want=$want")
    }
    graft.CacheScope.flush(spark)
  }

  test("random corpora: ingest scrub matches the reference set-membership " +
      "semantics (no first-copy exception)") {
    val w = 3
    val gen = for {
      nCorpus <- Gen.choose(1, 4)
      nArr <- Gen.choose(1, 5)
      docs <- Gen.sequence[Vector[Vector[String]], Vector[String]](
        Vector.fill(nCorpus + nArr)(for {
          len <- Gen.choose(0, 14)
          toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
        } yield toks.toVector))
    } yield (docs.take(nCorpus).zipWithIndex.map { case (t, i) =>
      (i.toLong, t) },
      docs.drop(nCorpus).zipWithIndex.map { case (t, i) =>
        (100L + i, t) })
    samples(gen, 25).foreach { case (corpus, arrivals) =>
      val idx = graft.TempArtifacts.dir("span_prop_idx")
      DedupQueries.buildNgramIndex(
        corpus.map { case (id, t) => (id, t.mkString(" ")) }
          .toDF("doc_id", "text"), w, idx)
      val got = DedupQueries.spanScrubAgainstIndex(spark,
          arrivals.map { case (id, t) => (id, t.mkString(" ")) }
            .toDF("doc_id", "text"), idx, w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4)))).toMap
      // reference: a window is removable iff its content is ANY corpus
      // window's content — the arrival holds no retained copy
      val known = (for {
        (_, toks) <- corpus
        p <- 0 to toks.length - w
      } yield toks.slice(p, p + w).mkString(" ")).toSet
      val want = arrivals.map { case (id, toks) =>
        val rem = (0 to toks.length - w)
          .filter(p => known.contains(toks.slice(p, p + w).mkString(" ")))
        val (n, s, rm, c) = refClean(toks, rem, w)
        id -> ((math.max(n, 1L), s, rm, c))
      }.toMap
      assert(got == want, s"corpus=${corpus.map(_._2.mkString(" "))} " +
        s"arrivals=${arrivals.map(_._2.mkString(" "))} got=$got want=$want")
    }
    graft.CacheScope.flush(spark)
  }
}
