package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Scale notes: shuffle partitions default to the local core count for
  * local runs; on a real cluster this is expected to be overridden
  * (spark.sql.shuffle.partitions) or handled by AQE coalescing, which we
  * enable. All timestamps are UTC for oracle parity.
  */
object GraftSession {
  /** Configs every Graft session needs, applied to an existing builder. */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.parquet stores TIMESTAMP(NANOS); Spark reads it as
      // nanos-since-epoch LongType with this flag (Tables.events converts).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Unfiltered count()/min/max over parquet answer from footer
      // statistics instead of scanning row groups (off by default in
      // Spark 4.x). The artifact lifecycles (q119/q150/q156) poll
      // row counts of their persisted components — metadata reads at
      // any scale. Exact by construction; Spark falls back to the
      // scan when a query shape is unsupported.
      .config("spark.sql.parquet.aggregatePushdown", "true")

  def get(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
