package graft

import org.apache.spark.sql.functions._

/** Stages the data-dominating bench layout: replicates the sf0.1 fact
  * tables N× with key-shifted replicas into a multi-file parquet layout
  * (dims copied 1×), so the headline benches can be measured at a size
  * where engine work dominates the fixed local scheduling floor.
  *
  * Key shifting keeps the scaled data realistic: each replica's keys are
  * offset by `max(key)+1`, so key cardinality grows with the data (a
  * naive copy would multiply duplicates per key instead — 50× group
  * sizes, not 50× groups) while dim-join semantics are preserved
  * (foreign keys into copied dims are left unshifted).
  *
  * The LLM-ops corpus tables get CONTENT perturbation on top of key
  * shifting, for the same realism reason: an identical text copy would
  * make every doc an exact/near duplicate of its N-1 replica siblings
  * (near-dup pair count quadratic in N — nothing like a corpus that
  * grew N×), so each replica suffixes every token with its replica tag
  * (intra-replica shingle/df structure identical to the original corpus,
  * cross-replica shingle overlap zero). Embedding replicas rotate the
  * vector by `rep % dim` positions: norms and within-replica geometry
  * preserved, cross-replica cosines decorrelated. Trade-off, documented:
  * suffixed tokens no longer hit the English stopword list, so text
  * quality/langid values differ from the originals (the per-token WORK —
  * the thing benched — is identical).
  *
  * Usage: runMain graft.MakeBigData [srcDir] [outDir] [replicas]
  */
object MakeBigData {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/root/repo/benchdata/x50"
    val replicas = if (args.length > 2) args(2).toInt else 50
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    /** max(key)+1 with a legible failure for empty tables / non-long
      * keys (a bare Row.getLong NPE'd on empty input). */
    def stride(name: String, key: String): Long = {
      val v = Tables(spark, src, name).agg(max(col(key))).head.get(0)
      require(v != null, s"MakeBigData: $name.$key has no values — empty source table?")
      v.asInstanceOf[Number].longValue() + 1L
    }
    // FK-linked key DOMAINS shift with ONE shared stride: independent
    // per-table maxes only keep replica joins aligned when the maxes
    // happen to be equal (an orderkey present in orders but not
    // lineitem, or |documents| != |embeddings| in the shared doc/vec id
    // space, would silently de-correlate every replica > 0 and bench
    // joins at ~1/N selectivity)
    val orderStride = math.max(stride("lineitem", "l_orderkey"), stride("orders", "o_orderkey"))
    val docVecStride = math.max(stride("documents", "doc_id"), stride("embeddings", "vec_id"))

    def replicate(name: String, shiftKeys: Seq[(String, Long)], files: Int,
        perturb: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): Unit = {
      val base = Tables(spark, src, name)
      val strides = shiftKeys
      val wide = base.crossJoin(spark.range(replicas).select(col("id").as("__rep")))
      val shifted = strides.foldLeft(wide) { case (df, (k, stride)) =>
        df.withColumn(k, col(k) + col("__rep") * stride)
      }
      perturb(shifted).drop("__rep")
        .repartition(files).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[bigdata] $name x$replicas (${shiftKeys.map(_._1).mkString(",")} shifted) -> $files files")
    }
    def copy(name: String, files: Int): Unit = {
      Tables(spark, src, name).repartition(files)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[bigdata] $name copied 1x -> $files files")
    }

    replicate("lineitem", Seq("l_orderkey" -> orderStride), 64)
    replicate("orders", Seq("o_orderkey" -> orderStride), 32)
    replicate("events", Seq(
      "event_id" -> stride("events", "event_id"),
      "user_id" -> stride("events", "user_id")), 32)
    replicate("documents", Seq("doc_id" -> docVecStride), 16, df =>
      // replica 0 keeps the original text; others suffix every token
      df.withColumn("text",
        when(col("__rep") === 0, col("text")).otherwise(
          array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("_"), col("__rep"))), " "))))
    replicate("embeddings", Seq("vec_id" -> docVecStride), 8, df => {
      // per-replica orthogonal transform: rotate by rep % dim, then
      // sign-flip half-blocks by bit pattern of rep / dim. Rotation
      // alone aliases once replicas exceed dim (rep and rep+dim would
      // get identical vectors — exact cross-replica duplicates); the
      // flip block extends distinctness to 4*dim replicas (256 at
      // dim 64 — covers x200). Both steps are orthogonal maps, so
      // norms and all within-replica cosines are exactly preserved.
      val d = size(col("embedding"))
      val r = (col("__rep") % d).cast("int")
      val b = floor(col("__rep") / d).cast("int")
      val rotated =
        when(r === 0, col("embedding")).otherwise(
          concat(slice(col("embedding"), r + 1, d - r),
            slice(col("embedding"), lit(1), r)))
      df.withColumn("embedding",
        transform(rotated, (x, i) => {
          val firstHalf = i < d / 2
          val flip = (b.bitwiseAND(1) === 1 && firstHalf) ||
            (b.bitwiseAND(2) === 2 && !firstHalf)
          when(flip, -x).otherwise(x)
        }))
    })
    Seq("customer" -> 4, "part" -> 2, "supplier" -> 1, "nation" -> 1, "region" -> 1)
      .foreach { case (t, f) => copy(t, f) }
    spark.stop()
  }
}
