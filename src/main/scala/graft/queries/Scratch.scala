package graft.queries

/** Shared throwaway scratch for query fixtures: ONE tmp root per JVM
  * with ONE exit-time cleanup hook, a unique subdirectory per call —
  * the per-call createTempDirectory + addShutdownHook copies accumulated
  * a hook per query execution across Bench's warm/timed re-runs (r19
  * review). Deletion is exit-time, not per-query: Bench/Verify run each
  * query at least twice and the warm run's lazy plan must outlive the
  * timed run (the q98 hygiene rule). Results never depend on scratch
  * contents across runs — these are build-and-read-back fixtures.
  */
private[queries] object Scratch {
  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-scratch-")
    sys.addShutdownHook {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      try rm(r) catch { case _: java.io.IOException => () }
    }
    r
  }

  /** A fresh scratch directory path (not created) under the shared root.
    * The LAST path segment must stay a valid unquoted SQL identifier
    * fragment (letters/digits/underscore only): several queries derive
    * table and view names from `dir.split('/').last` — a hyphen here
    * broke every CREATE TABLE built from it (caught by the r19 gate).
    */
  def dir(tag: String): String =
    root.toString + "/" + tag + "_" + java.util.UUID.randomUUID().toString.take(8)
}
