package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded lifecycle for intra-query persist(): operators that reuse an
  * intermediate several times within one query register it here instead
  * of calling a bare `persist()` (which pins cache for the session — an
  * unbounded leak over thousands of queries). Harness loops call
  * [[flush]] between queries; unpersist is always safe (Spark
  * recomputes from lineage if a consumer still holds the plan).
  *
  * Deliberately NOT localCheckpoint: checkpoint materialization is an
  * extra eager job + serialization pass, measured 2-3x slower than
  * persist reuse on the MinHash signature path.
  */
object CacheScope {
  private val retained =
    scala.collection.concurrent.TrieMap
      .empty[SparkSession, List[DataFrame]]

  /** Persist `df` (MEMORY_AND_DISK) and register it for the next flush. */
  def retain(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    df.persist()
    retained.updateWith(s) {
      case Some(l) => Some(df :: l)
      case None => Some(df :: Nil)
    }
    df
  }

  /** Unpersist everything retained for `s` since the last flush.
    * Non-blocking: production callers must not stall on block removal.
    */
  def flush(s: SparkSession): Unit = flush(s, blocking = false)

  /** Blocking variant for measurement harnesses (Bench): waits for the
    * blocks to actually drop so query N's cache debt is never paid
    * inside query N+1's timing window — what made in-suite readings
    * drift up to ~1.6x vs isolated reruns of the same code.
    *
    * Flushes every session sharing `s`'s SparkContext, not just `s`:
    * operators that scope confs through a child `newSession` (e.g.
    * FindStructures' small-grid AQE scoping) register retains under
    * the child, and the harness only knows the parent. Blocks live in
    * the shared context, so cross-session unpersist is the correct
    * lifetime boundary.
    */
  def flush(s: SparkSession, blocking: Boolean): Unit =
    retained.keys.filter(_.sparkContext eq s.sparkContext)
      .foreach(k => retained.remove(k)
        .foreach(_.foreach(_.unpersist(blocking))))
}
