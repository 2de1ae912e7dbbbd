package graft

import graft.schema.{FieldSpec, SchemaValidator}
import graft.sources.TabularReader
import org.apache.spark.sql.types._

class SchemaSpec extends GraftSpec {

  test("FieldSpec constraints mirror the reference") {
    // ragged_rank > 1 cannot combine with a fixed shape (dataframe.py:178-181)
    assertThrows[IllegalArgumentException] {
      FieldSpec("x", LongType, raggedRank = 2, shape = Seq(4))
    }
    assert(FieldSpec("x", LongType, raggedRank = 2).dataType ===
      ArrayType(ArrayType(LongType, false), false))
    assert(FieldSpec("x", LongType, shape = Seq(8)).dataType ===
      ArrayType(LongType, false))
  }

  test("dtype mapping covers all reference leaf types") {
    val m = FieldSpec.dtypeMapping
    assert(m("int64") === LongType)
    assert(m("uint64") === DecimalType(20, 0))
    assert(m("float16") === FloatType)
    assert(m.size === 10)
  }

  test("validateFields: missing without default is an error; with default is fine") {
    val fileSchema = StructType(Seq(StructField("a", LongType)))
    val bad = SchemaValidator.validateFields(fileSchema, Seq(FieldSpec("x", LongType)))
    assert(bad.exists(_.contains("no default_value")))
    val ok = SchemaValidator.validateFields(
      fileSchema, Seq(FieldSpec("x", LongType, defaultValue = Some(0L))))
    assert(ok.isEmpty)
  }

  test("validateFields: dtype and ragged-rank mismatches are reported") {
    val fileSchema = StructType(Seq(
      StructField("a", StringType),
      StructField("b", ArrayType(LongType))))
    val errs = SchemaValidator.validateFields(fileSchema, Seq(
      FieldSpec("a", LongType),
      FieldSpec("b", LongType, raggedRank = 2)))
    assert(errs.size === 2)
  }

  test("validateFiles accepts the driver tables against themselves") {
    val p = s"$sf/lineitem.parquet"
    assert(SchemaValidator.validateFiles(spark, Seq(p, p), peek = 3).isEmpty)
  }

  test("TabularReader: projection, default population, case-insensitive") {
    val fields = Seq(
      FieldSpec("L_ORDERKEY", LongType),
      FieldSpec("ghost", LongType, defaultValue = Some(7L)))
    val df = TabularReader.fromParquet(spark, Seq(s"$sf/lineitem.parquet"),
      TabularReader.Options(fields = fields, caseInsensitive = true))
    assert(df.columns.toSeq === Seq("L_ORDERKEY", "ghost"))
    assert(df.select("ghost").distinct().collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("TabularReader: fieldMapFn transforms the field list before the read") {
    // the reference's field_map_fn hook (table.py:83): drop + re-type
    val df = TabularReader.fromParquet(spark, Seq(s"$sf/lineitem.parquet"),
      TabularReader.Options(fieldMapFn = Some(fs =>
        fs.filter(f => Set("l_orderkey", "l_linenumber").contains(f.name))
          .map(f => if (f.name == "l_linenumber") f.copy(leafType = LongType) else f))))
    assert(df.columns.toSeq === Seq("l_orderkey", "l_linenumber"))
    assert(df.schema("l_linenumber").dataType === LongType) // re-typed via cast
  }

  test("TabularReader: strict validation rejects unknown field without default") {
    assertThrows[IllegalArgumentException] {
      TabularReader.fromParquet(spark, Seq(s"$sf/lineitem.parquet"),
        TabularReader.Options(fields = Seq(FieldSpec("nope", LongType))))
    }
  }

  test("strict null rejection reports per-column violations (reference refuses nulls)") {
    import spark.implicits._
    val df = Seq((Some(1L), "a"), (None, "b"), (None, "c")).toDF("x", "y")
    val v = SchemaValidator.nullViolations(df, Seq("x", "y"))
    assert(v === Map("x" -> 2L))
    assert(SchemaValidator.nullViolations(Tables.lineitem(spark, sf),
      Seq("l_orderkey", "l_quantity")).isEmpty)
  }

  test("padToLength pads and clips to the declared shape") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L, 4L, 5L), Seq.empty[Long]).toDF("xs")
    val out = df.select(
      TabularReader.padToLength(col("xs"), Some(3), 0L, LongType).as("p"))
      .collect().map(_.getSeq[Long](0).toList).toList
    assert(out === List(List(1, 2, 0), List(1, 2, 3), List(0, 0, 0)))
  }
}
