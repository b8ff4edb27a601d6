package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract for the distributed global rank / cumsum operators:
  * exact equality with the single-task window they replace, including
  * the negative-value case (partition totals must be true sums — a
  * max of the running cum only works for non-negative values).
  */
class RankingSpec extends AnyFunSuite {
  lazy val spark = graft.SharedSpark.spark
  import spark.implicits._

  test("globalRank matches row_number over a total order") {
    val df = (1 to 1000).map(i => (i.toLong, (i * 2654435761L) % 997))
      .toDF("id", "key")
    val got = Ranking.globalRank(df, "rnk", col("key"), col("id"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    val want = df.orderBy(col("key"), col("id")).select("id")
      .as[Long].collect().zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got == want)
    graft.CacheScope.flush(spark)
  }

  test("globalCumSum handles negative values (true partition sums)") {
    // alternating signs: max of the running cum within a partition is
    // NOT the partition total, so this catches a max-based offset
    val df = (1 to 500).map(i => (i.toLong, if (i % 2 == 0) i.toLong else -i.toLong))
      .toDF("id", "v")
    val got = Ranking.globalCumSum(df, "v", "cum", col("id"))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    var acc = 0L
    val want = (1 to 500).map { i =>
      acc += (if (i % 2 == 0) i.toLong else -i.toLong); i.toLong -> acc
    }.toMap
    assert(got == want)
    graft.CacheScope.flush(spark)
  }
}
