package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults, shared by Verify, Bench
  * and the test suites. */
object GraftSession {

  /** Apply engine defaults to a builder. Notable choices:
    *  - nanosAsLong: the driver testdata stores TIMESTAMP(NANOS), which
    *    Spark's parquet reader rejects by default; reading nanos as long
    *    + explicit µs conversion (Tables.events) reproduces DuckDB's
    *    ns→µs truncation exactly.
    *  - AQE on: runtime coalescing/skew-join is part of the scale story.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")

  def local(cores: String = "4", shufflePartitions: Option[Int] = None): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions",
          shufflePartitions.map(_.toString).getOrElse(cores)))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
