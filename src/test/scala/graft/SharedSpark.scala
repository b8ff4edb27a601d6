package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole forked test JVM. */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
