package graft.sources

import org.apache.spark.sql.DataFrame

/** Columnar sinks — the reference writes Parquet with pyarrow
  * (SNAPPY/ZSTD, dictionary encoding; reference:
  * docs/tutorial/ranking/taobao/data/prep_2_bahavior.py:54-59). Spark's
  * writers cover the same surface; this wrapper pins the options. */
object TabularWriter {

  def toParquet(df: DataFrame, path: String,
      compression: String = "snappy", overwrite: Boolean = true): Unit =
    df.write
      .mode(if (overwrite) "overwrite" else "errorifexists")
      .option("compression", compression)
      .parquet(path)

  def toOrc(df: DataFrame, path: String,
      compression: String = "snappy", overwrite: Boolean = true): Unit =
    df.write
      .mode(if (overwrite) "overwrite" else "errorifexists")
      .option("compression", compression)
      .orc(path)
}
