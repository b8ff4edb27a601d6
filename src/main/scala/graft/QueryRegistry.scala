package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator/query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver runs
  * against the same parquet tables. `oracle == None` -> driver records a
  * weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryRegistry {
  /** Full declared inventory, assembled from the per-area modules. */
  def all: Seq[Q] =
    relational.RelationalQueries.defs ++
      relational.JoinOps.defs ++
      text.TextQueries.defs ++
      text.BpeTrainer.defs ++
      dedup.DedupQueries.defs ++
      similarity.SimilarityQueries.defs ++
      grid.GridQueries.defs ++
      grid.TopologyQueries.defs ++
      streaming.StreamingQueries.defs ++
      multimodal.MultimodalQueries.defs ++
      multimodal.CodecQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
