package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults, shared by Verify, Bench
  * and the test suites. */
object GraftSession {

  /** Apply engine defaults to a builder. Notable choices:
    *  - nanosAsLong: older driver testdata stores TIMESTAMP(NANOS), which
    *    Spark's parquet reader rejects by default; reading nanos as long
    *    + explicit µs conversion (Tables.events) reproduces DuckDB's
    *    ns→µs truncation exactly.
    *  - inferTimestampNTZ off: current driver testdata stores
    *    TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 would
    *    otherwise surface as TIMESTAMP_NTZ — a type `unix_micros`,
    *    watermarks and several time kernels reject. Reading it as
    *    TIMESTAMP_LTZ under the UTC session zone is value-identical to
    *    DuckDB's naive read, preserving oracle parity.
    *  - AQE on: runtime coalescing/skew-join is part of the scale story.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
