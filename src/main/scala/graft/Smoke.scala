package graft

/** Minimal driver-contract smoke: SparkEntry.entry must return rows > 0
  * on sf0.001 (mirrors the driver's t1 check).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
