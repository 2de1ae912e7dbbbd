package graft

import org.apache.spark.sql.functions._

/** Scratch probe: decompose text_bpe_tokens cost at x200 — train job
  * vs encode+detok vs bounds — to locate the r7→r8 inflation (11.4 →
  * 32 s). Usage: runMain graft.ProbeBpe [dataDir] */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, d)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
      r
    }
    docs.write.format("noop").mode("overwrite").save() // warm cache
    val merges = t("train_cold")(operators.Bpe.train(docs, col("text"), 40))
    t("train_warm")(operators.Bpe.train(docs, col("text"), 40))
    println(s"[probe] merges=${merges.size} sample=${merges.take(5)}")
    val toks = operators.Bpe.encode(col("text"), merges)
    t("encode_size_only")(docs.select(size(toks).as("n"))
      .agg(sum(col("n"))).write.format("noop").mode("overwrite").save())
    t("encode_detok")(docs.select(col("doc_id"),
      when(col("text").isNotNull, concat_ws("", toks)).as("detok"))
      .write.format("noop").mode("overwrite").save())
    t("full_gate")(SparkEntry.queries("text_bpe_tokens")(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
