package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet tables (TESTDATA.md).
  *
  * All reads are plain `spark.read.parquet` so Catalyst predicate pushdown
  * and column pruning reach the scan. At 100 TB these tables would be
  * partitioned (e.g. lineitem by ship month); the loaders stay the single
  * choke point where that layout knowledge would live.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects unless `spark.sql.legacy.parquet.nanosAsLong` is on (set in
    * GraftSession / Verify / Bench). We truncate nanos -> micros exactly like
    * DuckDB's `epoch_ns(ts)//1000`, so oracle comparisons see identical
    * microsecond timestamps. Column `ts` is TIMESTAMP_NTZ (UTC wall clock).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }

  /** DuckDB CTE mirroring the events loader (nanos -> micros truncation).
    * Prefixed to every oracle that touches events.
    */
  val evCte: String =
    "ev AS (SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts, " +
      "user_id, event_type, value, props FROM events)"
}
