package graft

import graft.operators.Ragged
import graft.schema.{FieldSpec, SchemaValidator}
import graft.sources.{TabularReader, TabularWriter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Ragged / nested-list fidelity (FIXTURES §2-3) and the columnar sink. */
class RaggedSpec extends GraftSpec {

  test("COO round-trip: toCoo -> fromCoo is the identity") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b", "c")), (2L, Seq("x")), (3L, Seq.empty[String]))
      .toDF("id", "xs")
    val coo = Ragged.toCoo(df, col("id"), col("xs"))
    val back = Ragged.fromCoo(coo, col("key"), col("pos"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(back === Map(1L -> List("a", "b", "c"), 2L -> List("x"))) // empty lists vanish (sparse)
  }

  test("nested ragged (rank 2) COO carries both positions") {
    import spark.implicits._
    val df = Seq((1L, Seq(Seq(10L), Seq(20L, 30L)))).toDF("id", "nested")
    val got = Ragged.toCoo2(df, col("id"), col("nested"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(got === Set((1L, 0, 0, 10L), (1L, 1, 0, 20L), (1L, 1, 1, 30L)))
  }

  test("ragged_rank=2 + string-list frame round-trips through parquet (FIXTURES §3)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_nested").toString + "/f"
    val df = Seq(
      (1L, Seq(Seq(1L, 2L), Seq(3L)), Seq("a", "bb")),
      (2L, Seq(Seq.empty[Long]), Seq.empty[String]))
      .toDF("E_id", "E", "S")
    TabularWriter.toParquet(df, dir, compression = "zstd")
    val fields = Seq(
      FieldSpec("E_id", LongType),
      FieldSpec("E", LongType, raggedRank = 2),
      FieldSpec("S", StringType, raggedRank = 1))
    val back = TabularReader.fromParquet(spark, Seq(dir),
      TabularReader.Options(fields = fields))
    assert(back.count() === 2)
    val e1 = back.filter(col("E_id") === 1L).select("E").collect().head
      .getSeq[scala.collection.Seq[Long]](0).toList.map(_.toList)
    assert(e1 === List(List(1L, 2L), List(3L)))
    // declared rank mismatch is rejected
    val errs = SchemaValidator.validateFields(back.schema,
      Seq(FieldSpec("E", LongType, raggedRank = 1)))
    assert(errs.nonEmpty)
  }

  test("parquet sink honors the compression option") {
    val dir = Files.createTempDirectory("graft_codec").toString
    val df = Tables.events(spark, sf).select("event_id", "event_type").limit(100)
    TabularWriter.toParquet(df, s"$dir/sn", compression = "snappy")
    TabularWriter.toParquet(df, s"$dir/zs", compression = "zstd")
    val sn = new java.io.File(s"$dir/sn").listFiles().filter(_.getName.endsWith(".parquet"))
    val zs = new java.io.File(s"$dir/zs").listFiles().filter(_.getName.endsWith(".parquet"))
    assert(sn.exists(_.getName.contains("snappy")) && zs.exists(_.getName.contains("zstd")))
    assert(spark.read.parquet(s"$dir/zs").count() === 100)
  }

  test("gaucConsecutive matches hand-computed golden with warm-up skip") {
    import spark.implicits._
    // ord, indicator, label, score: groups [A(2 rows), B(3 rows), A(2 rows)]
    val df = Seq(
      (1L, "A", 1, 0.9), (2L, "A", 0, 0.1), // group 1 (dropped as warm-up)
      (3L, "B", 1, 0.8), (4L, "B", 0, 0.6), (5L, "B", 0, 0.2), // group 2: auc 1.0, cnt 3
      (6L, "A", 0, 0.7), (7L, "A", 1, 0.3)) // group 3: auc 0.0, cnt 2
      .toDF("o", "ind", "y", "s")
    val g = graft.functions.Metrics.gaucConsecutive(
      df, col("o"), col("ind"), col("y") === 1, col("s")).collect().head.getDouble(0)
    assert(g === ((1.0 * 3 + 0.0 * 2) / 5))
  }
}
