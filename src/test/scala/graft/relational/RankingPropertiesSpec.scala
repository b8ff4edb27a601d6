package graft.relational

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the distributed global rank / running-sum
  * machinery — the range exchange, the per-partition counting pass,
  * the driver-side exclusive prefix, and the offset-started narrow
  * numbering. The invariant that matters is PARTITIONING INDEPENDENCE:
  * the appended column must equal the driver-side sorted scan no
  * matter how the input was partitioned beforehand (1 partition, many,
  * more partitions than rows — i.e. empty shuffle partitions), with
  * negative values in the running sum and keys arriving in adversarial
  * order.
  */
class RankingPropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(523L + i)))

  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // unique keys (the documented total-order contract), values signed
  private val rowsGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(0, 200)
    keys <- Gen.pick(n, (0L until 1000L))
    vals <- Gen.listOfN(n, Gen.choose(-50L, 50L))
  } yield scala.util.Random.javaRandomToRandom(
    new java.util.Random(n)).shuffle(keys.toSeq).zip(vals)

  test("globalRank and globalCumSum equal the driver-side sorted " +
      "scan under every input partitioning (incl. empty partitions " +
      "and empty input); cumsum handles negatives") {
    samples(rowsGen, 4).zipWithIndex.foreach { case (rows, ci) =>
      val sorted = rows.sortBy(_._1)
      val wantRank = sorted.zipWithIndex
        .map { case ((k, _), ix) => k -> (ix + 1).toLong }.toMap
      val wantCum = {
        var acc = 0L
        sorted.map { case (k, v) => acc += v; k -> acc }.toMap
      }
      for (parts <- Seq(1, 3, 64)) {
        val df = rows.toDF("k", "v").repartition(parts)
        val gotRank = Ranking.globalRank(df, "rnk", col("k"))
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        assert(gotRank == wantRank,
          s"corpus $ci parts=$parts rank mismatch")
        val gotCum = Ranking.globalCumSum(df, "v", "cum", col("k"))
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        assert(gotCum == wantCum,
          s"corpus $ci parts=$parts cumsum mismatch")
      }
      graft.CacheScope.flush(spark)
    }
  }
}
