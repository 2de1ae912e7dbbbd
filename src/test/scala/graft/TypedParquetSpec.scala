package graft

import graft.functions.expressions.VecUtil
import graft.schema.FieldSpec
import graft.sources.{TabularReader, TypedParquet}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Exotic physical types the reference reads natively
  * (hybridbackend/common/arrow.cc:48-73, docs/data.md:23-27): float16 and
  * uint64, staged by a non-Spark parquet writer so the on-disk bytes
  * genuinely carry the exotic type. */
class TypedParquetSpec extends GraftSpec {

  test("half-float encode/decode round-trips exactly-representable values") {
    val exact = Seq(0.0f, -0.0f, 0.5f, -0.5f, 1.0f, 999.5f, -999.5f, 2048.0f,
      65504.0f, // max finite half
      5.9604645e-8f, // min subnormal half
      6.1035156e-5f) // min normal half
    exact.foreach { f =>
      val bits = TypedParquet.floatToHalfBits(f)
      assert(TypedParquet.halfBitsToFloat(bits) === f, f"value $f%.8g")
    }
  }

  test("half-float encode rounds to nearest-even; specials survive") {
    // 0.1f is not representable in binary16: nearest half is 0.099975586
    assert(TypedParquet.halfBitsToFloat(TypedParquet.floatToHalfBits(0.1f)) === 0.099975586f)
    // midpoint rounds to even mantissa: 2049 is exactly between 2048 and 2050
    assert(TypedParquet.halfBitsToFloat(TypedParquet.floatToHalfBits(2049.0f)) === 2048.0f)
    assert(TypedParquet.halfBitsToFloat(TypedParquet.floatToHalfBits(2051.0f)) === 2052.0f)
    // overflow -> Inf; NaN -> NaN; Inf -> Inf
    assert(TypedParquet.halfBitsToFloat(TypedParquet.floatToHalfBits(1e6f)).isPosInfinity)
    assert(TypedParquet.halfBitsToFloat(TypedParquet.floatToHalfBits(Float.NaN)).isNaN)
    assert(TypedParquet.halfBitsToFloat(TypedParquet.floatToHalfBits(Float.NegativeInfinity)).isNegInfinity)
    // underflow -> signed zero
    assert(TypedParquet.halfBitsToFloat(TypedParquet.floatToHalfBits(1e-9f)) === 0.0f)
  }

  test("decode agrees with encode over the full 16-bit space") {
    // every finite half value must decode to a float that re-encodes to
    // the same bits (decode is exact, encode of an exact value is identity)
    (0 until 0x10000).foreach { h =>
      val e = (h >> 10) & 0x1F
      if (e != 0x1F) { // skip Inf/NaN payloads (NaN re-encode canonicalizes)
        val f = VecUtil.halfBitsToFloat(h)
        assert((TypedParquet.floatToHalfBits(f) & 0xFFFF) === h, s"bits $h")
      }
    }
  }

  test("Spark 4.1 rejects the FLOAT16 logical annotation (documented)") {
    val dir = Files.createTempDirectory("graft_fp16_ann").toString
    TypedParquet.writeFloat16(s"$dir/f.parquet", 5, _.toFloat, annotate = true)
    val e = intercept[Exception] {
      spark.read.parquet(s"$dir/f.parquet").collect()
    }
    assert(e.getMessage.contains("PARQUET_TYPE_ILLEGAL"), e.getMessage)
  }

  test("fp16 FLBA(2) file reads as float through the dtype mapping") {
    val dir = Files.createTempDirectory("graft_fp16").toString
    TypedParquet.writeFloat16(s"$dir/f.parquet", 100, i => (i - 50) / 4.0f)
    val df = TabularReader.fromParquet(spark, Seq(s"$dir/f.parquet"),
      TabularReader.Options(fields = Seq(
        FieldSpec("id", LongType), FieldSpec("half_val", FloatType))))
    assert(df.schema("half_val").dataType === FloatType)
    val got = df.collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    (0L until 100L).foreach(i => assert(got(i) === (i - 50) / 4.0f, s"row $i"))
  }

  test("uint64 reads as DECIMAL(20,0) with above-Long.MaxValue values intact") {
    val dir = Files.createTempDirectory("graft_u64").toString
    TypedParquet.writeUInt64(s"$dir/u.parquet", 10, i => java.lang.Long.MIN_VALUE + i)
    val df = TabularReader.fromParquet(spark, Seq(s"$dir/u.parquet"),
      TabularReader.Options(fields = Seq(
        FieldSpec("id", LongType), FieldSpec("u", DecimalType(20, 0)))))
    assert(df.schema("u").dataType === DecimalType(20, 0))
    val got = df.orderBy("id").collect().map(_.getDecimal(1).toBigInteger)
    val base = new java.math.BigInteger("9223372036854775808") // 2^63
    (0 until 10).foreach(i =>
      assert(got(i) === base.add(java.math.BigInteger.valueOf(i.toLong))))
  }

  test("small/unsigned ints read with the documented widenings, values intact") {
    val dir = Files.createTempDirectory("graft_smallint").toString
    TypedParquet.writeSmallInts(s"$dir/s.parquet", 300)
    val df = spark.read.parquet(s"$dir/s.parquet")
    // what Spark's reader ACTUALLY does with INT(bits, signed) annotations
    // (pins FieldSpec.dtypeMapping: int8->Byte, uint8->Short, uint32->Long)
    assert(df.schema("i8").dataType === ByteType)
    assert(df.schema("u8").dataType === ShortType)
    assert(df.schema("u16").dataType === IntegerType)
    assert(df.schema("u32").dataType === LongType)
    val r = df.filter(col("id") === 200).collect().head
    assert(r.getByte(1) === ((200 % 256) - 128).toByte)
    assert(r.getShort(2) === (200 % 256).toShort)
    assert(r.getInt(3) === 200 % 65536)
    // unsigned read of raw bits -1-200: 2^32 - 201 — above Int.MaxValue
    assert(r.getLong(4) === 4294967296L - 201L)
    // and TabularReader enforces the declared mapping end-to-end
    val tr = TabularReader.fromParquet(spark, Seq(s"$dir/s.parquet"),
      TabularReader.Options(fields = Seq(
        FieldSpec("id", LongType), FieldSpec("u8", ShortType), FieldSpec("u32", LongType))))
    assert(tr.schema.fields.map(_.dataType).toSeq === Seq(LongType, ShortType, LongType))
    assert(tr.count() === 300)
  }

  test("list<fp16> reads as array<float> through the ragged dtype mapping") {
    val dir = Files.createTempDirectory("graft_fp16_list").toString
    TypedParquet.writeFloat16List(s"$dir/l.parquet", 100, (i, j) => (i % 50) + j / 2.0f)
    val df = TabularReader.fromParquet(spark, Seq(s"$dir/l.parquet"),
      TabularReader.Options(fields = Seq(
        FieldSpec("id", LongType), FieldSpec("halves", FloatType, raggedRank = 1))))
    assert(df.schema("halves").dataType.asInstanceOf[ArrayType].elementType === FloatType)
    // the fixture writes i % 4 == 0 rows as EMPTY lists, not NULL — the
    // empty-but-present case must decode as a real zero-length array
    val got = df.collect().map { r =>
      assert(!r.isNullAt(1), s"row ${r.getLong(0)}: empty list must not read as NULL")
      r.getLong(0) -> r.getSeq[Float](1).toList
    }.toMap
    (0L until 100L).foreach { i =>
      val want = (0 until (i % 4).toInt).map(j => (i % 50) + j / 2.0f).toList
      assert(got(i) === want, s"row $i")
    }
  }

  test("fromCsv with a declared schema reproduces the parquet rows") {
    val dir = Files.createTempDirectory("graft_csv_tr").toString + "/ev"
    val cols = Seq("event_id", "user_id", "event_type", "value", "props")
    val orig = Tables.events(spark, sf).select(cols.map(col): _*)
    orig.write.option("header", "true").csv(dir)
    val back = TabularReader.fromCsv(spark, Seq(dir), orig.schema)
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).count() === 0 && orig.exceptAll(back).count() === 0)
  }
}
