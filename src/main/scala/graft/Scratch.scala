package graft

/** Per-JVM scratch space for the sink/round-trip catalog entries (s5-s9,
  * j9/j10, st8-st10, sim9, ...): every written corpus lands under ONE
  * process-scoped root that a single shutdown hook deletes recursively —
  * repeated verify/bench runs no longer leak written corpora into /tmp
  * (each entry invocation previously created an orphan temp directory).
  *
  * Catalog queries want throwaway isolation, not durability, so deleting
  * on JVM exit is the right lifetime; a production lake sink writes to a
  * caller-supplied path and never goes through this.
  */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(r)))
    r
  }

  /** A fresh empty directory under the shared scratch root. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix + "_").toString

  private def delete(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val all = java.nio.file.Files.walk(p)
      try all.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(f =>
          try java.nio.file.Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () })
      finally all.close()
    }
  }
}
