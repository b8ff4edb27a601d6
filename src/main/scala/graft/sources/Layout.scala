package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned layout: `<path>/<col>=<value>/part-*.parquet`.
  * A filter on the partition column prunes whole directories at
  * planning time (`PartitionFilters` in the scan — asserted in
  * LayoutSpec), so a 100 TB table filtered to one partition reads only
  * that partition's bytes. This is the coarse pruning layer; Z-order
  * keys (q73) order data WITHIN partitions for min/max row-group
  * skipping, and bucketing (sources.Bucketing) co-locates join keys.
  * Partition columns should be low-cardinality (source, date, shard) —
  * one directory per value.
  */
object Layout {
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
