package graft

import graft.schema.SchemaValidator
import graft.sources.TabularReader
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source formats + the batch-boundary-invariance property (the
  * guarantee the reference's rebatch operator provides: query results
  * are independent of file/row-group layout — SURVEY §2.3, §5). */
class SourcesSpec extends GraftSpec {

  test("ORC round-trip through TabularReader.fromOrc") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/events_orc"
    val events = Tables.events(spark, sf)
    events.write.mode("overwrite").orc(dir)
    val back = TabularReader.fromOrc(spark, Seq(dir))
    assert(back.count() === events.count())
    assert(back.select("event_id", "user_id", "value").exceptAll(
      events.select("event_id", "user_id", "value")).count() === 0)
  }

  test("CSV source reads the same rows (reference's baseline path)") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/li_csv"
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(li.schema).csv(dir)
    assert(back.exceptAll(li).count() === 0 && li.exceptAll(back).count() === 0)
  }

  test("query results are invariant to input partition layout") {
    val li = Tables.lineitem(spark, sf)
    def q1(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).as("s"))
        .orderBy("l_returnflag").collect().toSeq
    val base = q1(li)
    assert(q1(li.repartition(1)) === base)
    assert(q1(li.repartition(13)) === base)
    assert(q1(graft.operators.Partitioners.shuffleRows(li, 99L)) === base)
  }

  test("tiny maxPartitionBytes (many splits) yields identical rows") {
    val conf = spark.conf
    val old = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val manySplits = spark.read.parquet(s"$sf/lineitem.parquet")
      assert(manySplits.rdd.getNumPartitions >= 1)
      val n = manySplits.count()
      conf.set("spark.sql.files.maxPartitionBytes", old)
      assert(n === spark.read.parquet(s"$sf/lineitem.parquet").count())
    } finally conf.set("spark.sql.files.maxPartitionBytes", old)
  }

  test("validateFiles flags schema drift between files") {
    val dir = Files.createTempDirectory("graft_drift").toString
    import spark.implicits._
    Seq((1L, "x")).toDF("a", "b").write.parquet(s"$dir/f1")
    Seq((1L, 2L)).toDF("a", "b").write.parquet(s"$dir/f2") // b: string vs long
    val mm = SchemaValidator.validateFiles(spark, Seq(s"$dir/f1", s"$dir/f2"))
    assert(mm.nonEmpty)
  }
}
