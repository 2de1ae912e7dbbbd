package graft

import graft.schema.SchemaValidator

/** Schema-validation CLI — the analog of the reference's
  * `python -m hybridbackend.tensorflow.data.validate files… --lower --peek N`
  * (reference: hybridbackend/tensorflow/data/validate.py:34-98): assert
  * all files share one schema (name/dtype/ragged-rank) and optionally
  * peek-read N rows from each.
  *
  * Usage: runMain graft.Validate [--lower] [--peek N] [--format parquet|orc] file...
  */
object Validate {
  def main(args: Array[String]): Unit = {
    var lower = false
    var peek = 0
    var format = "parquet"
    val files = scala.collection.mutable.ArrayBuffer[String]()
    val usage = "usage: graft.Validate [--lower] [--peek N] [--format parquet|orc] file..."
    def argAfter(i: Int, flag: String): String = {
      require(i + 1 < args.length, s"$flag needs a value\n$usage")
      args(i + 1)
    }
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--lower" => lower = true
        case "--peek" => peek = argAfter(i, "--peek").toInt; i += 1
        case "--format" => format = argAfter(i, "--format"); i += 1
        // an unrecognized flag must not silently become a "file" and
        // surface later as a confusing path error
        case f if f.startsWith("--") => sys.error(s"unknown option $f\n$usage")
        case f => files += f
      }
      i += 1
    }
    require(files.nonEmpty, usage)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val mismatches = SchemaValidator.validateFiles(
      spark, files.toSeq, format, caseInsensitive = lower, peek = peek)
    if (mismatches.isEmpty) println(s"OK: ${files.size} files share one schema")
    else {
      mismatches.foreach(m => println(s"MISMATCH ${m.path}: ${m.detail}"))
      sys.exit(1)
    }
    spark.stop()
  }
}
