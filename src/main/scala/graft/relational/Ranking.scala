package graft.relational

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField}

/** Distributed exact global ranking. A bare `row_number() OVER (ORDER
  * BY ...)` funnels every row through ONE task (Spark warns "No
  * Partition Defined" and the stage serializes); this computes the
  * identical rank in parallel: range-partition on the total sort key
  * (partition ids ascend with the key by RangePartitioning's
  * contract), sort within partitions, number rows with a narrow
  * per-partition pass, then add the cumulative row counts of the
  * partitions before it. The counts/offsets tables are
  * partition-count-sized (metadata scale, broadcast back), so the only
  * data-sized costs are the range exchange and the per-partition sort
  * — what a global sort already pays. (A `Window.partitionBy(pid)`
  * would NOT do: range partitioning does not satisfy the window's
  * hash-clustering requirement, so Catalyst would re-shuffle the whole
  * dataset a second time.)
  */
object Ranking {

  /** Append exact global rank `out` (1-based long) ordering by
    * `sortCols`, which must form a TOTAL order (append a unique
    * tiebreak column) — ties across a partition boundary would
    * otherwise make ranks partitioning-dependent.
    */
  def globalRank(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    // retained: partition ids must be consistent between the rank pass
    // and the counts pass, and both read the one range exchange + sort
    val parted = graft.CacheScope.retain(
      df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*))
    val schema = parted.schema
      .add(StructField("__pid", IntegerType, nullable = false))
      .add(StructField("__r", LongType, nullable = false))
    // narrow pass: rows arrive in sorted order per partition, so a
    // running counter IS the in-partition row_number — no window, no
    // second exchange
    val withR = spark.createDataFrame(
      parted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var i = 0L
        it.map { r => i += 1; Row.fromSeq(r.toSeq :+ pid :+ i) }
      }, schema)
    val counts = withR.groupBy("__pid").agg(count(lit(1)).as("__c"))
    // cumulative offset via a triangular self-join of the tiny counts
    // table — not a global window (that would reintroduce the
    // single-task stage this operator exists to avoid)
    val offs = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__c")), lit(0L)).as("__off"))
    withR.join(broadcast(offs), "__pid")
      .withColumn(out, (col("__off") + col("__r")).cast("long"))
      .drop("__pid", "__r", "__off")
  }

  /** Append the INCLUSIVE global running sum of long column `valueCol`
    * in `sortCols` order — same machinery as [[globalRank]] (range
    * exchange + in-partition sort + narrow accumulation + broadcast
    * per-partition offsets), same cost model: one data-sized exchange.
    * The exclusive prefix (e.g. a byte start-offset) is
    * `out - valueCol`.
    */
  def globalCumSum(df: DataFrame, valueCol: String, out: String,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val parted = graft.CacheScope.retain(
      df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*))
    val vIdx = parted.schema.fieldIndex(valueCol)
    val schema = parted.schema
      .add(StructField("__pid", IntegerType, nullable = false))
      .add(StructField("__cum", LongType, nullable = false))
    val withC = spark.createDataFrame(
      parted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = 0L
        it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ pid :+ acc) }
      }, schema)
    // per-partition totals = the max inclusive cum of each partition
    val sums = withC.groupBy("__pid").agg(max("__cum").as("__c"))
    val offs = sums.as("a")
      .join(sums.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__c")), lit(0L)).as("__off"))
    withC.join(broadcast(offs), "__pid")
      .withColumn(out, col("__off") + col("__cum"))
      .drop("__pid", "__cum", "__off")
  }
}
