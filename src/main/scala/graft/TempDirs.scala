package graft

/** Temp directories the driver-checked queries create (pool roots for the
  * etl / pool / ingest scenarios), deleted recursively at JVM exit: the
  * bench runs each such query 3-7 times per suite and the verify harness
  * runs them again every round, so without cleanup each round strands a
  * pile of committed parquet segments in java.io.tmpdir.
  */
object TempDirs {
  private val registry = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registry.forEach { root =>
      try {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { val _ = java.nio.file.Files.deleteIfExists(p) })
        finally walk.close()
      } catch { case scala.util.control.NonFatal(_) => () } // exit-time best effort
    }
  }))

  /** Create a temp dir scheduled for recursive deletion at JVM exit. */
  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registry.add(p)
    p.toString
  }
}
