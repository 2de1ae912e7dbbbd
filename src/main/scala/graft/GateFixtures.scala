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

  /** Order-key-bucketed catalog tables — the persistent co-located
    * layout the bucketed gates read (PERF.md round-8: the exchange-free
    * answer to the per-order aggregate/join class). Staged once per
    * (session catalog, data dir); the warehouse dir outlives the JVM
    * but the in-memory catalog doesn't, so stale locations are cleared
    * before CREATE (same discipline as join_bucketed_colocated). The
    * bf_ prefix avoids colliding with join_bucketed_colocated's own
    * b_orders$tag table (bucketed on o_custkey — reusing it here would
    * silently lose the o_orderkey distribution). */
  def bucketedLineitem(s: org.apache.spark.sql.SparkSession, d: String): String =
    bucketedTable(s, d, "bf_lineitem") { name =>
      import org.apache.spark.sql.functions.col
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_linestatus"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey").saveAsTable(name)
    }

  def bucketedOrders(s: org.apache.spark.sql.SparkSession, d: String): String =
    bucketedTable(s, d, "bf_orders") { name =>
      import org.apache.spark.sql.functions.col
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").bucketBy(8, "o_orderkey").saveAsTable(name)
    }

  private def bucketedTable(s: org.apache.spark.sql.SparkSession, d: String,
      base: String)(write: String => Unit): String = {
    val name = base + d.replaceAll("[^A-Za-z0-9]", "_")
    if (!s.catalog.tableExists(name)) {
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      deleteRecursively(java.nio.file.Paths.get(wh, name))
      write(name)
    }
    name
  }

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
