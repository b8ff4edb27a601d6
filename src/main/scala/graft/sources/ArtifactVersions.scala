package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Versioned artifact roots with an atomically-swapped CURRENT pointer
  * — the zero-downtime REBUILD half of the index lifecycle (the
  * advance paths mutate a live artifact in place; a centroid-drift
  * trigger firing, q142, demands a FULL rebuild, and that rebuild
  * must not disturb readers of the live version):
  *
  *   - a root contains immutable version directories `v1, v2, ...`
  *     plus a tiny `CURRENT` file naming the live one;
  *   - [[prepareNext]] allocates the next version dir — writers build
  *     the new artifact there while readers keep resolving the old;
  *   - [[publish]] flips `CURRENT` via temp-file + atomic rename, so
  *     a reader sees either the old or the new version, never a torn
  *     pointer, and a crash mid-publish leaves the old version live;
  *   - versions are never rewritten: a reader that resolved a path
  *     keeps a consistent artifact for its whole query, even across a
  *     concurrent publish.
  *
  * Local-filesystem IO here; on a cluster the same protocol runs
  * against any store with atomic rename (HDFS) or conditional put —
  * the pointer file is exactly how table formats commit snapshots.
  */
object ArtifactVersions {
  private val Pointer = "CURRENT"

  /** The live version's directory, if a publish has happened. */
  def current(root: String): Option[String] = {
    val p = Paths.get(root, Pointer)
    if (!Files.exists(p)) None
    else Some(Paths.get(root,
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
      .toString)
  }

  /** Allocate (and create) the next version directory — NOT yet live.
    * Concurrent-writer safe: the dir is claimed with an atomic
    * `createDirectory` (not create-if-absent), so two racing writers
    * can never be handed the same vN — the loser's
    * FileAlreadyExistsException just advances it to the next number.
    */
  def prepareNext(root: String): String = {
    val r = Paths.get(root)
    Files.createDirectories(r)
    var next = 1 + Option(r.toFile.listFiles).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toInt).foldLeft(0)(math.max)
    while (true) {
      try {
        val dir = r.resolve(s"v$next")
        Files.createDirectory(dir)
        return dir.toString
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => next += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Atomically make a prepared version the live one. The pointer
    * bytes are fsynced BEFORE the atomic rename (write-then-rename
    * without the sync can surface an empty/torn CURRENT after a power
    * loss on ext4-style filesystems — the rename commits the name, not
    * the data), and each publish uses a unique temp name so concurrent
    * publishers never clobber each other's staging file: last rename
    * wins the pointer, which is the documented semantics.
    */
  def publish(root: String, versionDir: String): Unit = {
    val name = Paths.get(versionDir).getFileName.toString
    require(Files.isDirectory(Paths.get(root, name)),
      s"$versionDir is not a version dir under $root")
    val tmp = Files.createTempFile(Paths.get(root), Pointer + ".", ".tmp")
    try {
      val out = new java.io.FileOutputStream(tmp.toFile)
      try {
        out.write(name.getBytes(StandardCharsets.UTF_8))
        out.flush()
        out.getFD.sync()
      } finally out.close()
      Files.move(tmp, Paths.get(root, Pointer),
        StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE): Unit
    } finally
      // a failed publish must not strand its uniquely-named staging
      // file (after a successful move this is a no-op); a POWER loss
      // can still leave one behind — harmless, prepareNext ignores it
      Files.deleteIfExists(tmp): Unit
  }

  /** RETIRE old versions — the retention half of the lifecycle,
    * without which every compaction/rebuild leaks a full artifact
    * copy forever. Deletes version dirs numerically MORE than
    * `keep - 1` behind the live one: the live version always
    * survives, the `keep - 1` most recent predecessors survive as a
    * grace window for readers that resolved their path just before a
    * publish, and versions NEWER than CURRENT (prepared but not yet
    * published) are never touched. Callers pick `keep` so the grace
    * window outlives their longest reader (a reader pinned across
    * `keep` consecutive publishes is the documented out-of-contract
    * case). Returns the retired dirs. No-op before the first publish.
    */
  def pruneVersions(root: String, keep: Int = 2): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    current(root) match {
      case None => Seq.empty
      case Some(cur) =>
        val curN = Paths.get(cur).getFileName.toString.drop(1).toInt
        Option(Paths.get(root).toFile.listFiles).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.matches("v\\d+")
            && f.getName.drop(1).toInt <= curN - keep)
          .sortBy(_.getName.drop(1).toInt)
          .map { f => deleteRecursively(f.toPath); f.toString }
          .toSeq
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Option(p.toFile.listFiles).getOrElse(Array.empty)
        .foreach(f => deleteRecursively(f.toPath))
    Files.deleteIfExists(p): Unit
  }
}
