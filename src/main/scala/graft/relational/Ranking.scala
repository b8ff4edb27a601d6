package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed exact global ranking. A bare `row_number() OVER (ORDER
  * BY ...)` funnels every row through ONE task (Spark warns "No
  * Partition Defined" and the stage serializes); this computes the
  * identical rank in parallel: range-partition on the total sort key
  * (partition ids ascend with the key by RangePartitioning's
  * contract), rank within each partition, then add the cumulative row
  * counts of the partitions before it. The counts/offsets tables are
  * partition-count-sized (metadata scale, broadcast back), so the only
  * data-sized costs are the range exchange and the per-partition sort
  * — what a global sort already pays.
  */
object Ranking {

  /** Append exact global rank `out` (1-based long) ordering by
    * `sortCols`, which must form a TOTAL order (append a unique
    * tiebreak column) — ties across a partition boundary would
    * otherwise make ranks partitioning-dependent.
    */
  def globalRank(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    // retained: partition ids must be consistent between the rank pass
    // and the counts pass (spark_partition_id is plan-dependent)
    val parted = graft.CacheScope.retain(
      df.repartitionByRange(sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__c"))
    // cumulative offset via a triangular self-join of the tiny counts
    // table — not a global window (that would reintroduce the
    // single-task stage this operator exists to avoid)
    val offs = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__c")), lit(0L)).as("__off"))
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    parted.withColumn("__r", row_number().over(w))
      .join(broadcast(offs), "__pid")
      .withColumn(out, (col("__off") + col("__r")).cast("long"))
      .drop("__pid", "__r", "__off")
  }
}
