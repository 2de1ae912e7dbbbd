package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.schema.FieldSpec
import graft.sources.{TfRecordCodec, TfRecordSource}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord container + tf.train.Example codec and the DataFrame
  * read/write surface. */
class TfRecordSpec extends GraftSpec {
  import TfRecordCodec._

  test("CRC32C matches the public check vector; framing round-trips") {
    // classic CRC32C check vector: crc32c("123456789") = 0xe3069283
    val c = new java.util.zip.CRC32C
    c.update("123456789".getBytes("UTF-8"))
    assert(c.getValue === 0xe3069283L)
    val out = new ByteArrayOutputStream()
    val payloads = Seq("hello".getBytes, Array[Byte](), Array.fill(1000)(7.toByte))
    payloads.foreach(writeRecord(out, _))
    val back = readRecords(new ByteArrayInputStream(out.toByteArray)).toSeq
    assert(back.map(_.toSeq) === payloads.map(_.toSeq))
  }

  test("corrupt byte raises; skipCorrupted truncates at the last good record") {
    val out = new ByteArrayOutputStream()
    writeRecord(out, "first".getBytes)
    writeRecord(out, "second".getBytes)
    val bytes = out.toByteArray
    bytes(bytes.length - 6) = (bytes(bytes.length - 6) ^ 0x01).toByte // inside "second"
    val it = readRecords(new ByteArrayInputStream(bytes))
    assert(new String(it.next()) === "first")
    intercept[java.io.IOException] { it.hasNext }
  }

  test("tf.train.Example round-trips every feature kind") {
    val feats = Seq(
      "ints" -> Int64List(Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)),
      "floats" -> FloatList(Seq(0.0f, -2.5f, Float.MaxValue, Float.NaN)),
      "strs" -> BytesList(Seq("héllo", "", "wörld😀").map(_.getBytes("UTF-8"))),
      "empty" -> Int64List(Nil))
    val decoded = decodeExample(encodeExample(feats))
    assert(decoded("ints") === Int64List(Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)))
    decoded("floats") match {
      case FloatList(vs) =>
        assert(vs.take(3) === Seq(0.0f, -2.5f, Float.MaxValue) && vs(3).isNaN)
      case other => fail(s"unexpected $other")
    }
    decoded("strs") match {
      case BytesList(vs) => assert(vs.map(new String(_, "UTF-8")) === Seq("héllo", "", "wörld😀"))
      case other => fail(s"unexpected $other")
    }
    assert(decoded("empty") === Int64List(Nil))
  }

  test("unknown protobuf fields are skipped, not fatal") {
    val valid = encodeExample(Seq("x" -> Int64List(Seq(42L))))
    // prepend a bogus top-level field (field 9, varint wire type)
    val withJunk = Array[Byte](0x48, 0x01) ++ valid
    assert(decodeExample(withJunk)("x") === Int64List(Seq(42L)))
  }

  test("DataFrame round-trip: scalars, doubles-as-float32, shards") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec_test").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("float").as("value_f32"))
    TfRecordSource.write(ev.repartition(4), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tfrecord")) === 4)
    val back = TfRecordSource.read(spark, Seq(dir), Seq(
      FieldSpec("event_id", LongType), FieldSpec("user_id", LongType),
      FieldSpec("event_type", StringType), FieldSpec("value_f32", FloatType)))
    assert(back.exceptAll(ev).count() === 0)
    assert(ev.exceptAll(back).count() === 0)
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("DataFrame round-trip: float arrays and gzip streams") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec_gz").toString
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    TfRecordSource.write(emb.repartition(2), dir, gzip = true)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".gz")) === 2)
    val back = TfRecordSource.read(spark, Seq(dir), Seq(
      FieldSpec("vec_id", LongType), FieldSpec("embedding", FloatType, raggedRank = 1)))
    assert(back.exceptAll(emb).count() === 0)
    assert(emb.exceptAll(back).count() === 0)
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("re-writing a directory overwrites it — stale part files never mix in") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec_ovr").toString
    import spark.implicits._
    TfRecordSource.write(Seq(1L, 2L, 3L, 4L).toDF("id").repartition(4), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tfrecord")) === 4)
    TfRecordSource.write(Seq(10L).toDF("id").repartition(1), dir)
    val back = TfRecordSource.read(spark, Seq(dir), Seq(FieldSpec("id", LongType)))
      .collect().map(_.getLong(0)).toSet
    assert(back === Set(10L)) // run 1's part-00001..3 are gone
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("short/boolean and binary arrays round-trip; null array element is a clear error") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec_types").toString
    import spark.implicits._
    val df = Seq((1L, 7.toShort, true, Seq(Array[Byte](1, 2), Array[Byte](3))),
      (2L, -3.toShort, false, Seq(Array[Byte]())))
      .toDF("id", "sh", "flag", "blobs")
    TfRecordSource.write(df, dir)
    val back = TfRecordSource.read(spark, Seq(dir), Seq(
      FieldSpec("id", LongType), FieldSpec("sh", ShortType),
      FieldSpec("flag", BooleanType), FieldSpec("blobs", BinaryType, raggedRank = 1)))
      .collect().map(r => (r.getLong(0), r.getShort(1), r.getBoolean(2),
        r.getSeq[Array[Byte]](3).map(_.toSeq)))
      .sortBy(_._1)
    assert(back(0) === ((1L, 7.toShort, true, Seq(Seq[Byte](1, 2), Seq[Byte](3)))))
    assert(back(1) === ((2L, -3.toShort, false, Seq(Seq[Byte]()))))
    val nullElem = Seq((1L, Seq("x", null))).toDF("id", "tags")
    val e = intercept[org.apache.spark.SparkException] {
      TfRecordSource.write(nullElem, dir + "_bad")
    }
    assert(e.getMessage.contains("null array element")
      || Option(e.getCause).exists(_.getMessage.contains("null array element")))
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("int64 that does not fit the declared IntegerType raises, never truncates") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec_narrow").toString
    import spark.implicits._
    TfRecordSource.write(Seq(3000000000L).toDF("id"), dir)
    val e = intercept[org.apache.spark.SparkException] {
      TfRecordSource.read(spark, Seq(dir), Seq(FieldSpec("id", IntegerType))).collect()
    }
    assert(e.getMessage.contains("does not fit")
      || Option(e.getCause).exists(_.getMessage.contains("does not fit")))
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("malformed protobuf length in a CRC-valid payload fails fast (no spin, no AIOOBE)") {
    // field 1 wiretype 2 with a 5-byte varint length far past the buffer
    val bad = Array[Byte](0x0a, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x0f)
    intercept[java.io.IOException] { decodeExample(bad) }
    // and a length that would move the cursor backwards via toInt overflow
    val neg = Array[Byte](0x0a, 0xfe.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f)
    intercept[java.io.IOException] { decodeExample(neg) }
  }

  test("missing features fall back to the spec default") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec_dflt").toString
    import spark.implicits._
    TfRecordSource.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    val back = TfRecordSource.read(spark, Seq(dir), Seq(
      FieldSpec("id", LongType),
      FieldSpec("absent", LongType, defaultValue = Some(-7L))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back === Map(1L -> -7L, 2L -> -7L))
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
