package graft

import graft.schema.FieldSpec
import graft.sources.TfRecordSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev bench: TFRecord read throughput vs the parquet scan of the same
  * rows — the reference's data_benchmark_tfrecord.py comparison, whose
  * published story is exactly that columnar beats TFRecord by an order
  * of magnitude (docs/data.md). Stages events once as sharded TFRecord
  * under /tmp, then times full materialization of both formats.
  *
  * Usage: runMain graft.BenchTfRecord [dataDir] [shards] [reps]
  */
object BenchTfRecord {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/benchdata/x50")
    val shards = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val cols = Seq(col("event_id"), col("user_id"), col("event_type"),
      col("value").cast("float").as("value_f32"))
    val n = Tables.events(spark, dir).count()

    // shards is part of the memo key: a same-JVM re-run with a
    // different shard count must stage fresh, not reuse the old layout
    val staged = GateFixtures.dir(s"tfrecord_bench_$shards", dir) { target =>
      TfRecordSource.write(Tables.events(spark, dir).select(cols: _*)
        .repartition(shards), target)
    }
    val fields = Seq(FieldSpec("event_id", LongType), FieldSpec("user_id", LongType),
      FieldSpec("event_type", StringType), FieldSpec("value_f32", FloatType))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(f: => Unit): Double = (1 to reps).map(_ => time(f)).min

    val warm = time { // touch both paths once (codegen, fs cache)
      TfRecordSource.read(spark, Seq(staged), fields)
        .write.format("noop").mode("overwrite").save()
      Tables.events(spark, dir).select(cols: _*)
        .write.format("noop").mode("overwrite").save()
    }
    val tfr = best {
      TfRecordSource.read(spark, Seq(staged), fields)
        .write.format("noop").mode("overwrite").save()
    }
    val pq = best {
      Tables.events(spark, dir).select(cols: _*)
        .write.format("noop").mode("overwrite").save()
    }
    println(s"""{"metric":"tfrecord","rows":$n,"shards":$shards,""" +
      s""""tfrecord_sec":$tfr,"parquet_sec":$pq,""" +
      s""""tfrecord_rows_per_sec":${(n / tfr).toLong},"warm_sec":$warm,"dir":"$dir"}""")
    spark.stop()
  }
}
