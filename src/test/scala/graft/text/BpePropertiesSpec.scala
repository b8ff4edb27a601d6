package graft.text

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the BPE trainer's trickiest machinery — the
  * \u001f-wrapped string `replace` must implement EXACTLY the leftmost
  * non-overlapping merge scan of a reference BPE trainer, including
  * self-overlapping pairs ("aaa" + (a,a) -> [aa, a]) and back-to-back
  * occurrences ("abab" + (a,b) -> [ab, ab]). A driver-side reference
  * implementation (explicit symbol lists, index-walking merge) is run
  * on random small corpora and compared merge-for-merge, count-for-
  * count against the distributed trainer.
  */
class BpePropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(97L + i)))

  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Reference trainer: word multiset -> adopted merges (pair, cnt). */
  private def refBpe(words: Map[String, Long],
      iters: Int): Seq[(String, Long)] = {
    var segs: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var step = 0
    var done = false
    while (step < iters && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (s, c) =>
        (0 until s.length - 1).foreach { i =>
          val k = (s(i), s(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count; ties by (a, b) ascending — the trainer's
        // orderBy(cnt desc, a, b) rule
        val ((a, b), cnt) = counts.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        out += ((s"$a $b", cnt))
        segs = segs.map { case (s, c) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
              nb += (a + b); i += 2 // leftmost, non-overlapping
            } else { nb += s(i); i += 1 }
          }
          (nb.result(), c)
        }
        step += 1
      }
    }
    out.toSeq
  }

  /** Reference encoder: apply the adopted merges in order (leftmost,
    * non-overlapping) to one word; its price is the symbol count —
    * identical machinery whether the word was seen in training or not.
    */
  private def refEncode(merges: Seq[(String, String)], w: String): Int = {
    var s: Vector[String] = w.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      val nb = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
          nb += (a + b); i += 2
        } else { nb += s(i); i += 1 }
      }
      s = nb.result()
    }
    s.length
  }

  test("held-out encode prices every word — vocab hit or OOV — exactly " +
      "as the reference greedy merge application (q151)") {
    val word = Gen.choose(2, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val docGen = Gen.listOfN(6, word).map(_.mkString(" "))
    val corpus = Gen.listOfN(8, docGen)
    samples(corpus, 6).foreach { docsTexts =>
      val docs = docsTexts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val trainWords = docsTexts.zipWithIndex.filter(_._2 % 4 != 3)
        .flatMap(_._1.split(" ")).filter(_.length >= 2)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val merges = refBpe(trainWords, BpeTrainer.BpeIters)
        .map { p => val Array(a, b) = p._1.split(" "); (a, b) }
      val got = BpeTrainer.bpeEncodeHeldOut(docs).collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
      val want = docsTexts.zipWithIndex.filter(_._2 % 4 == 3)
        .map { case (t, i) =>
          i.toLong -> t.split(" ").filter(_.nonEmpty)
            .map(w => refEncode(merges, w).toLong).sum
        }.toMap
      assert(got == want,
        s"held-out pricing $got != reference $want on corpus $docsTexts")
      graft.CacheScope.flush(spark)
    }
  }

  test("a long unseen word is priced > 1 by applying the learned merges " +
      "(the flat unk=1 pricing is dead)") {
    val docs = Seq(
      (0L, "aaab aaab aaab"), (1L, "aaab aaab aaab"),
      (2L, "aaab aaab ccdd"),
      (3L, "aaaa"), (7L, "aaab zz")).toDF("doc_id", "text")
    // merges learned on docs 0-2: (a,a), (a,b), (aa,ab), (c,c)
    val out = BpeTrainer.bpeEncodeHeldOut(docs).orderBy("doc_id").collect()
    // doc 3: "aaaa" unseen -> (a,a) applies twice -> [aa][aa] = 2 tokens
    assert(out(0).getLong(0) == 3L && out(0).getLong(1) == 1L
      && out(0).getLong(2) == 1L && out(0).getLong(3) == 2L,
      s"got ${out(0)}")
    // doc 7: vocab "aaab" fully merged (1) + unseen "zz" (no merge: 2)
    assert(out(1).getLong(0) == 7L && out(1).getLong(2) == 1L
      && out(1).getLong(3) == 3L, s"got ${out(1)}")
    graft.CacheScope.flush(spark)
  }

  test("trainer merges match the reference implementation on random corpora") {
    // small alphabet forces heavy pair collisions, self-overlaps, and
    // multi-char merged symbols within 4 iterations
    val word = Gen.choose(2, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.listOfN(8,
      word.flatMap(w => Gen.choose(1, 4).map(c => (w, c))))
    samples(corpus, 8).zipWithIndex.foreach { case (ws, i) =>
      val words = ws.groupBy(_._1).view
        .mapValues(_.map(_._2.toLong).sum).toMap
      val text = ws.flatMap { case (w, c) => Seq.fill(c)(w) }.mkString(" ")
      val docs = Seq((i.toLong, text)).toDF("doc_id", "text")
      val got = BpeTrainer.bpeTrainerOf(docs)
        .collect()
        .map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt"))).toSeq
      val want = refBpe(words, BpeTrainer.BpeIters)
      assert(got == want,
        s"corpus '$text': trainer $got != reference $want")
      graft.CacheScope.flush(spark)
    }
  }

  test("q151 served from the persisted split model equals the recompute") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = graft.TempArtifacts.dir("bpe_heldout_test")
    BpeTrainer.saveHeldOutModel(docs, dir)
    val served = BpeTrainer.heldOutEncodeWithModel(docs, dir)
      .orderBy("doc_id").collect()
    val rec = BpeTrainer.bpeEncodeHeldOut(docs).orderBy("doc_id").collect()
    assert(served.nonEmpty && served.sameElements(rec),
      "artifact-served held-out pricing diverged from the recompute")
    graft.CacheScope.flush(spark)
  }

  test("q153 compression drift: per-source totals tie to the per-doc " +
      "encode; vs_corpus straddles 1") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = graft.TempArtifacts.dir("bpe_q153_test")
    BpeTrainer.saveBpeModel(docs, dir)
    val rows = BpeTrainer.tokenCompressionBySource(docs, dir).collect()
    assert(rows.length > 1, "needs several sources to be a drift monitor")
    // artifact-served per-source masses == recompute per-doc masses
    val perDoc = BpeTrainer.bpeEncodeOf(docs).collect()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum
      == perDoc.map(_.getAs[Long]("n_tokens")).sum)
    assert(rows.map(_.getAs[Long]("n_words")).sum
      == perDoc.map(_.getAs[Long]("n_words")).sum)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == perDoc.length.toLong)
    // vs_corpus is a token-weighted mean-1 ratio: some source sits at
    // or below the corpus ratio, some at or above
    val vs = rows.map(_.getAs[Double]("vs_corpus"))
    assert(vs.min <= 1.0 && 1.0 <= vs.max, vs.mkString(","))
    graft.CacheScope.flush(spark)
  }
}
