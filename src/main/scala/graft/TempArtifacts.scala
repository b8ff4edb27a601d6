package graft

/** Temp dirs for per-JVM index artifacts (dedup signatures, IVF
  * centroids/assignments), deleted on JVM exit so bench/verify
  * invocations never accumulate stale copies. In production these
  * artifacts live at a durable path with their own lifecycle; the temp
  * form exists for the self-contained harness queries.
  */
object TempArtifacts {
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(d)
    }
    d.toString
  }
}
