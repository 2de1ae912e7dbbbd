package graft

/** Dev tool: [[Verify]] for a SUBSET of gate queries — dumps the named
  * queries' results plus their oracle SQL so `scripts/check.py` can
  * compare just the queries under iteration instead of the full gate.
  *
  * Usage: runMain graft.VerifySubset <name,name,...> [sfDir] [outDir]
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: VerifySubset <name,name,...> [sfDir] [outDir]")
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/verify_subset"
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      Verify.naiveTs(SparkEntry.queries(name)(spark, sfDir)).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[verify-subset] wrote $name")
    }
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${JsonOut.q(k)}: ${JsonOut.q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
