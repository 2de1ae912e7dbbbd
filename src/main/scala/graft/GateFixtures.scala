package graft

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.ConcurrentHashMap

/** One-time staging of derived gate fixtures (ORC/compressed/nested
  * copies of the test tables). Gate queries are (SparkSession, dir) =>
  * DataFrame functions invoked repeatedly — by Verify, by every Bench
  * iteration, by specs — and writing the fixture inside the query would
  * bill the staging write to every invocation and leak one temp dir per
  * call. Fixtures are memoized per (kind, source data dir) and removed
  * by a JVM shutdown hook.
  */
private[graft] object GateFixtures {
  private val staged = new ConcurrentHashMap[String, String]()

  /** Returns the fixture directory for `kind` over `dataDir`, invoking
    * `write(targetDir)` only on first use per JVM. */
  def dir(kind: String, dataDir: String)(write: String => Unit): String =
    staged.computeIfAbsent(s"$kind|$dataDir", { _ =>
      val root = Files.createTempDirectory(s"graft_${kind}_gate")
      sys.addShutdownHook(deleteRecursively(root))
      val target = root.resolve("data").toString
      write(target)
      target
    })

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
