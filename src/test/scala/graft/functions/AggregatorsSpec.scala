package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pure-logic properties of the custom aggregation buffers: whatever the
  * partial-aggregation tree shape (task splits, merge order), the result
  * must equal the global computation — that invariant is what makes a
  * buffer safe for distributed partial aggregation.
  */
class AggregatorsSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))

  test("TopK equals sort.take(k) under arbitrary reduce/merge trees") {
    import Aggregators.{TopK, TopKBuf, TopKRow}
    val rowGen = for {
      ord <- Gen.chooseNum(-5.0, 5.0)
      id <- Gen.chooseNum(0L, 20L) // small range forces ord AND id ties
    } yield TopKRow(ord, id)
    val caseGen = for {
      rows <- Gen.listOf(rowGen)
      k <- Gen.choose(1, 5)
      nChunks <- Gen.choose(1, 6)
      seed <- Gen.choose(0, 1000)
    } yield (rows, k, nChunks, seed)

    for ((rows, k, nChunks, seed) <- samples(caseGen, 200)) {
      val agg = new TopK(k)
      // simulate the distributed shape: rows split across "tasks",
      // each reduced locally, partials merged in a shuffled order
      val rnd = new scala.util.Random(seed)
      val chunks = rows.grouped(math.max(1, (rows.size + nChunks - 1) / nChunks))
        .toSeq
      val partials = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials)
        .foldLeft(agg.zero)(agg.merge)
      val expected = rows.sortBy(r => (r.ord, r.id)).take(k)
      assert(agg.finish(merged) == TopKBuf(expected),
        s"rows=$rows k=$k chunks=$nChunks")
    }
  }

  test("WeightedAvg merge order does not change the result") {
    import Aggregators.WeightedAvg
    val in = Seq((1.0, 2.0), (3.0, 1.0), (10.0, 0.5), (4.0, 4.0))
    val b1 = in.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce)
    val (l, r) = in.splitAt(2)
    val b2 = WeightedAvg.merge(
      l.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce),
      r.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce))
    assert(math.abs(WeightedAvg.finish(b1) - WeightedAvg.finish(b2)) < 1e-12)
  }
}
