package graft.functions

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SetOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("SortedIntersectCount counts the exact sorted-set intersection") {
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d"), 2L),
      (Seq("a"), Seq("a"), 1L),
      (Seq("a", "z"), Seq("b", "y"), 0L),
      (Seq.empty[String], Seq("a"), 0L),
      // unicode past ASCII: UTF8String binary order must match
      // sort_array's order for the merge to be correct
      (Seq("a", "é", "中"), Seq("é", "中"), 2L))
    rows.foreach { case (a, b, want) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(SetOps.sortedIntersectCount(
          sort_array(col("a")), sort_array(col("b"))))
        .as[Long].head()
      assert(got == want, s"($a, $b)")
    }
  }

  test("SortedIntersectCount agrees with array_intersect size on random sets") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 200).map { _ =>
      def set() = (0 until rnd.nextInt(30))
        .map(_ => s"t${rnd.nextInt(40)}").distinct
      (set(), set())
    }.toDF("a", "b")
    val diff = df.select(
        SetOps.sortedIntersectCount(sort_array(col("a")), sort_array(col("b")))
          .as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("SortedIntersectCount propagates null arrays") {
    val df = Seq((Some(Seq("a")), Option.empty[Seq[String]])).toDF("a", "b")
    assert(df.select(SetOps.sortedIntersectCount(col("a"), col("b")))
      .head().isNullAt(0))
  }
}
