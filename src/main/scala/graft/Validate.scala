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
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--lower" => lower = true
        case "--peek" => peek = args(i + 1).toInt; i += 1
        case "--format" => format = args(i + 1); i += 1
        case f => files += f
      }
      i += 1
    }
    require(files.nonEmpty, "usage: graft.Validate [--lower] [--peek N] [--format f] file...")
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
