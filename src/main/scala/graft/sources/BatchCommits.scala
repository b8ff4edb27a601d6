package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths,
  StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** EXACTLY-ONCE batch appends for parquet-directory artifact
  * components (dedup signatures/bands, n-gram grams, IVF assignment
  * lists, streaming decision logs).
  *
  * The problem: Structured Streaming's foreachBatch is at-least-once —
  * a crash between the batch's side effects and the checkpoint commit
  * replays the whole batch, and a plain `mode("append")` then appends
  * its rows twice. The fix is the same one Spark's own file-stream
  * sink uses (FileStreamSink's _spark_metadata log: per-batch commits,
  * readers see only committed files), reduced to the filesystem
  * primitive these artifacts already rely on for versioning: each
  * batch's rows are written to a HIDDEN staging directory under the
  * component (invisible to readers — Spark's file index skips '.'/'_'
  * names), then promoted with ONE atomic directory rename to
  * `batch-<id>`. The rename is the commit AND the processed-batchId
  * record:
  *
  *   - crash mid-staging: the orphan `.staging-<id>` dir stays
  *     invisible; the replay overwrites it and commits;
  *   - crash after the rename: the replay finds `batch-<id>` and
  *     SKIPS — no double append, ever;
  *   - multi-component advances (signatures + bands) fence each
  *     component independently, so a crash between the two renames
  *     replays into "skip the committed one, complete the missing
  *     one" — recovery, not duplication.
  *
  * Readers use [[readComponent]] (recursive file lookup) so a
  * component holds flat build files and committed batch dirs side by
  * side. On a cluster the same protocol runs against any store with
  * atomic directory rename (HDFS); on S3-style stores the rename
  * becomes a manifest write, which is exactly the _spark_metadata /
  * table-format commit design this models.
  */
object BatchCommits {
  private def batchDir(dir: String, batchId: Long): Path =
    Paths.get(dir, s"batch-$batchId")

  /** Has `batchId` already been committed to this component? */
  def isCommitted(dir: String, batchId: Long): Boolean =
    Files.isDirectory(batchDir(dir, batchId))

  /** Commit `df`'s rows as batch `batchId`'s ONE append to the
    * component at `dir`. Returns false (and evaluates nothing) when
    * the batch is already committed — the replay fence.
    */
  def appendBatch(df: DataFrame, dir: String, batchId: Long): Boolean = {
    val target = batchDir(dir, batchId)
    if (Files.isDirectory(target)) return false
    Files.createDirectories(Paths.get(dir))
    val staging = Paths.get(dir, s".staging-$batchId")
    deleteRecursively(staging) // leftover of a crashed attempt
    df.write.mode("overwrite").parquet(staging.toString)
    try {
      Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      // a concurrent/replayed committer won the rename — discard ours
      case e: java.nio.file.FileSystemException
          if Files.isDirectory(target) || e.isInstanceOf[FileAlreadyExistsException] =>
        deleteRecursively(staging)
        false
    }
  }

  /** Read a component that may hold flat build files plus committed
    * `batch-<id>` subdirectories. Recursive lookup (with Spark's
    * hidden-name filtering) sees both; a plain non-recursive parquet
    * read would silently miss the subdirectories.
    */
  def readComponent(s: SparkSession, dir: String): DataFrame =
    s.read.option("recursiveFileLookup", "true").parquet(dir)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      if (Files.isDirectory(p))
        Option(p.toFile.listFiles).getOrElse(Array.empty)
          .foreach(f => deleteRecursively(f.toPath))
      Files.deleteIfExists(p): Unit
    }
  }
}
