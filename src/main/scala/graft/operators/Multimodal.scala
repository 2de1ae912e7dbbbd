package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, batched decode / feature-extraction over partitions.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * codecs): `decodeStub` produces deterministic fake features from the
  * leading bytes. Everything around it — the binary column layout, the
  * metadata struct, the per-partition batched UDF shape, partitioning —
  * is real Spark plumbing and is what a codec would plug into.
  */
object Multimodal {

  /** Pack a text corpus as (id, bytes, meta) — the opaque-binary media
    * layout. `meta` is the typed sidecar a real pipeline would carry
    * (dimensions, format, source). */
  def packBinary(df: DataFrame, id: Column, payload: Column, format: String): DataFrame =
    df.select(
      id.as("media_id"),
      encode(payload, "UTF-8").as("bytes"),
      struct(
        octet_length(payload).as("byte_len"),
        lit(format).as("format")).as("meta"))

  /** STUB — deterministic fake media decode: first `dim` bytes scaled to
    * [0,1]. A real implementation would decode the codec here; the
    * signature (bytes -> fixed-dim float features) is the contract. */
  def decodeStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim && i < bytes.length) {
      out(i) = (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched per-partition decode — the Scala analog of a vectorized
    * (mapInPandas-style) decode UDF: one JVM call per partition, the
    * stub applied per row inside. Input df must have (media_id: long,
    * bytes: binary); output adds `features: array<float>`. */
  def decodeFeatures(spark: SparkSession, df: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      df.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) => (id, decodeStub(bytes, dim)) })
      .toDF("media_id", "features")
  }

  /** Expression-only feature extraction (for engine-level tests/oracles):
    * same semantics as decodeStub for UTF-8 ASCII payloads — leading
    * characters' byte values scaled to [0,1]. Codegen'd, no UDF. */
  def asciiFeatures(payload: Column, dim: Int = 8): Column =
    transform(graft.functions.TextFunctions.chars(substring(payload, 1, dim)),
      c => ascii(c) / 255.0)

  /** Frame-sampling analog: take every `stride`-th byte position (as a
    * character index for UTF-8 payloads) — the shape of video
    * frame-sampling over an opaque byte stream. */
  def sampleStride(payload: Column, stride: Int): Column =
    transform(
      sequence(lit(1), length(payload), lit(stride)),
      i => ascii(payload.substr(i, lit(1))))
}
