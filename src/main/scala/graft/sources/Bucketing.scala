package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table sink/source: the co-located-join layout for recurring
  * fact-fact joins. Writing both sides bucketed (and sorted) on the join
  * key means every later join of the two tables is shuffle-free — the
  * exchange that dominates a 100 TB fact-fact join is paid once at write
  * time and amortized over every subsequent query. This is the
  * "repartition/bucketing for co-located joins" half of the scale design
  * (broadcast covers dimension tables).
  */
object Bucketing {
  /** Write `df` as a bucketed, sorted external parquet table registered
    * in the session catalog. `path` holds the data; the catalog entry
    * carries the bucket spec Catalyst needs to elide the exchange.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** Read a bucketed table back (bucket metadata comes from the catalog,
    * so joins on the bucket key skip the shuffle).
    */
  def readBucketed(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
