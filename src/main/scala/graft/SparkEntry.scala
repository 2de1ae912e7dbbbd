package graft

import graft.schema.FieldSpec
import graft.sources.TabularReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Numeric discipline for oracle parity: money/quantity sums are
  * accumulated in DECIMAL (exact, order-independent) and cast to DOUBLE
  * in the final projection, so Spark and DuckDB produce bit-identical
  * results regardless of aggregation order. Every computed column is
  * aliased identically in the Spark plan and the oracle SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val dec = (c: String) => col(c).cast(DecimalType(12, 2))
      li.filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec("l_quantity")).cast(DoubleType).as("sum_qty"),
          sum(dec("l_extendedprice")).cast(DoubleType).as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1).cast(DecimalType(4, 2)) - dec("l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    "scan_projection_defaults" -> { (s, d) =>
      // TabularReader: projection + missing-field default population
      // (reference: populate_defaults, dataframe.py:458-501).
      val fields = Seq(
        FieldSpec("l_orderkey", LongType),
        FieldSpec("l_linenumber", IntegerType),
        FieldSpec("l_quantity", DoubleType),
        FieldSpec("missing_feat", LongType, defaultValue = Some(42L)))
      TabularReader.fromParquet(s, Seq(s"$d/lineitem.parquet"),
        TabularReader.Options(fields = fields))
    },
    "join_orders_customer" -> { (s, d) =>
      // Embedding-lookup-shaped equi-join: fact ids x dim table
      // (reference: embedding/sharding.py:168-205 — semantically a
      // distributed hash equi-join preserving input multiplicity).
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(
          col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_mktsegment"), col("o_totalprice"))
    },
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "scan_projection_defaults" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, CAST(42 AS BIGINT) AS missing_feat FROM lineitem",
    "join_orders_customer" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
  )
}
