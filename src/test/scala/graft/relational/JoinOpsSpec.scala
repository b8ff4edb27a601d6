package graft.relational

import graft.{SharedSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("asofBackward equals the naive inequality-join implementation") {
    val e = Tables.events(spark, sf)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max_by(col("value"), col("event_id")).as("click_value"))

    val fast = JoinOps.asofBackward(purchases, clicks, Seq("user_id"),
        "ts", "click_ts", Seq("click_ts", "click_value"))
      .select("user_id", "event_id", "click_ts", "click_value")

    // naive: inequality join + keep max click_ts per left row (the shape
    // that explodes at scale; here it is the ground truth)
    val c = clicks.withColumnRenamed("user_id", "c_uid")
    val naive = purchases
      .join(c, col("user_id") === col("c_uid") && col("click_ts") <= col("ts"),
        "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "event_id")
          .orderBy(col("click_ts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "click_ts", "click_value")

    val a = fast.collect().map(_.toSeq).toSet
    val b = naive.collect().map(_.toSeq).toSet
    assert(a == b, s"asof mismatch: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
  }

  test("intervalJoin equals the naive inequality join, incl. bin-edge cases") {
    import spark.implicits._
    // intervals deliberately hit bin edges (hi = multiples of the bin
    // width), overlap each other, and leave gaps; points sit on lo, on
    // hi, inside, in gaps, and far outside.
    val intervals = Seq((0L, 0.0, 4.0), (1L, 2.0, 8.0), (2L, 8.0, 8.5),
      (3L, 20.0, 32.0)).toDF("iv", "lo", "hi")
    val points = Seq(0.0, 1.9, 2.0, 4.0, 7.999, 8.0, 8.5, 15.0, 20.0,
      31.999, 32.0, 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "pt")
    val fast = JoinOps.intervalJoin(points, "pt", intervals, "lo", "hi", 4.0)
      .select("pid", "iv").collect().map(_.toSeq).toSet
    val naive = points.join(intervals,
        col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("pid", "iv").collect().map(_.toSeq).toSet
    assert(fast == naive, s"diff: ${fast.diff(naive)} / ${naive.diff(fast)}")
    // a point inside two overlapping intervals matched both
    assert(naive.count(_.head == 2L) == 2)
  }

  test("saltedJoin is semantically identical to the plain equi-join") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("okey"), col("l_extendedprice"))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    val salted = JoinOps.saltedJoin(li, ord, "okey", salt = 4)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = li.join(ord, "okey")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
  }

  test("saltedJoinHotKeys equals the plain join with skewed duplicates") {
    import spark.implicits._
    // key 1 is hot (60 dup rows), keys 2..9 are cold; key 99 unmatched
    val big = ((1 to 60).map(i => (1L, s"b$i")) ++
      (2L to 9L).map(k => (k, s"c$k")) :+ ((99L, "x"))).toDF("k", "bv")
    val small = (1L to 9L).map(k => (k, k * 10)).toDF("k", "sv")
    val fast = JoinOps.saltedJoinHotKeys(big, small, "k", salt = 4,
        hotThreshold = 10)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = big.join(small, "k")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(fast == plain)
  }

  test("profiledSaltedJoin (census-derived hot set) equals the plain " +
      "join, hot key present or not") {
    import spark.implicits._
    // key 1 is 60/69 of the big side (x_mean >> 4 -> salted); the
    // cold keys take the plain path; key 99 never matches
    val big = ((1 to 60).map(i => (1L, s"b$i")) ++
      (2L to 9L).map(k => (k, s"c$k")) :+ ((99L, "x"))).toDF("k", "bv")
    val small = (1L to 9L).map(k => (k, k * 10)).toDF("k", "sv")
    val fast = JoinOps.profiledSaltedJoin(big, small, "k", salt = 4)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = big.join(small, "k")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(fast == plain)
    // uniform data: the census selects nothing, the salted leg is
    // empty, and the result is still exactly the plain join
    val uni = (1L to 9L).map(k => (k, s"u$k")).toDF("k", "bv")
    val fastU = JoinOps.profiledSaltedJoin(uni, small, "k", salt = 4)
      .collect().map(_.toSeq).toSet
    val plainU = uni.join(small, "k").collect().map(_.toSeq).toSet
    assert(fastU == plainU)
  }

  test("asofBackward leaves left rows with no match (null payload)") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 8L, 100.0)).toDF("k", "rt", "v")
    val out = JoinOps.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)))).toSet
    assert(out == Set(
      (1L, 10L, "a", Some(100.0)), // rt=8 <= t=10
      (1L, 5L, "b", None),         // no right row at or before 5
      (2L, 7L, "c", None)))        // key never on right
  }

  test("asofBackward ignores right rows with a null timestamp") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, Option.empty[Long], 99.0), (1L, Some(4L), 1.0))
      .toDF("k", "rt", "v")
    val out = JoinOps.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect()
    // the null-ts row (v=99) must never match; the rt=4 row does
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
  }

  test("asofBackward includes equal timestamps (inclusive semantics)") {
    import spark.implicits._
    val left = Seq((1L, 8L)).toDF("k", "t")
    val right = Seq((1L, 8L, 1.5)).toDF("k", "rt", "v")
    val out = JoinOps.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.5)
  }

  test("bloomSemiJoin equals the plain left-semi join") {
    val li = Tables.lineitem(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val fast = JoinOps.bloomSemiJoin(li, "l_orderkey", urgent, "o_orderkey",
        1L << 16, 0.03)
      .select("l_orderkey", "l_linenumber")
      .collect().map(_.toSeq).toSet
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .select("l_orderkey", "l_linenumber")
      .collect().map(_.toSeq).toSet
    assert(fast == plain && fast.nonEmpty)
  }

  test("TopK aggregator matches window top-k incl. ties, across merges") {
    import spark.implicits._
    // equal ord values force the id tie-break; repartition(7) forces
    // partial-buffer merges across tasks
    val rows = Seq((1, 5.0, 10L), (1, 5.0, 3L), (1, 5.0, 7L), (1, 1.0, 99L),
      (1, 0.5, 50L), (2, 2.0, 1L), (2, 3.0, 2L), (3, 9.0, 4L))
      .toDF("g", "ord", "id").repartition(7)
    val topk = udaf(new graft.functions.Aggregators.TopK(3))
    val got = rows.groupBy("g").agg(topk(col("ord"), col("id")).as("t"))
      .select(col("g"), posexplode(col("t.items")).as(Seq("pos", "r")))
      .select(col("g"), col("pos"), col("r.ord"), col("r.id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1, 0, 0.5, 50L), (1, 1, 1.0, 99L), (1, 2, 5.0, 3L),
      (2, 0, 2.0, 1L), (2, 1, 3.0, 2L),
      (3, 0, 9.0, 4L)))
  }
}
