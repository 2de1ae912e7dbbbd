package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.functions.expressions.GraftExpressions
import org.apache.spark.sql.functions._

class ExpressionsSpec extends GraftSpec {

  test("native dot_product equals the HOF fold bit-for-bit") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id")).limit(500)
    val diff = pairs.select(
      (VectorFunctions.dot(col("a"), col("b")) -
        VectorFunctions.dotHof(
          transform(col("a"), _.cast("double")),
          transform(col("b"), _.cast("double")))).as("d"))
      .agg(max(abs(col("d")))).collect().head.getDouble(0)
    assert(diff === 0.0)
  }

  test("native poly_hash equals the HOF fold on the corpus") {
    val n = Tables.documents(spark, sf)
      .select(TextFunctions.polyHash(col("text")).as("a"),
        TextFunctions.polyHashHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n === 0)
  }

  test("native expressions stay inside whole-stage codegen") {
    val plan = Tables.embeddings(spark, sf)
      .select(VectorFunctions.dot(col("embedding"), col("embedding")),
        GraftExpressions.poly_hash(col("vec_id").cast("string")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages
    assert(plan.contains("*(1) Project [dotproduct"))
  }

  test("SQL registration via GraftExtensions") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT graft_dot(embedding, embedding) AS d,
        |       graft_poly_hash(CAST(vec_id AS STRING)) AS h
        |FROM emb_sql LIMIT 5""".stripMargin).collect()
    assert(r.length === 5 && r.forall(row => row.getDouble(0) > 0))
  }

  test("injected optimizer rule collapses nested idempotent normalizations") {
    import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Lower}
    def lowersIn(session: org.apache.spark.sql.SparkSession): Int = {
      val docs = Tables.documents(session, sf)
      docs.select(lower(lower(trim(trim(col("text"))))).as("t"))
        .queryExecution.optimizedPlan
        .expressions.map(_.collect { case l: Lower => l }.size).sum
    }
    // with GraftExtensions: one Lower (and one StringTrim) survive
    assert(lowersIn(spark) === 1)
    // the collapse comes from OUR injected rule (present in the session's
    // optimizer), not a built-in Catalyst pass: applying the analyzed
    // plan's Lower stack to the rule directly removes exactly one level
    assert(spark.sessionState.optimizer.batches.flatMap(_.rules)
      .exists(_.ruleName.endsWith("CollapseIdempotent")))
    val analyzed = Tables.documents(spark, sf)
      .select(lower(lower(col("text"))).as("t")).queryExecution.analyzed
    val before = analyzed.expressions.map(_.collect { case l: Lower => l }.size).sum
    val after = graft.plans.CollapseIdempotent(analyzed)
      .expressions.map(_.collect { case l: Lower => l }.size).sum
    assert(before === 2 && after === 1)
    // array_distinct stacks collapse too (shingle pipelines produce them)
    val dd = Tables.documents(spark, sf)
      .select(array_distinct(array_distinct(split(col("text"), " "))).as("s"))
      .queryExecution.optimizedPlan
      .expressions.map(_.collect { case a: ArrayDistinct => a }.size).sum
    assert(dd === 1)
  }

  test("kernels reject null elements and ragged lengths loudly, never silently") {
    import spark.implicits._
    // through the unsafe accessors a null slot would read as 0.0 —
    // a silently-wrong dot product; the kernel must name the problem
    val withNull = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
    val e1 = intercept[Exception] {
      withNull.select(GraftExpressions.dot_product(col("a"), col("b"))).collect()
    }
    assert(e1.getMessage.contains("null array element")
      || Option(e1.getCause).exists(_.getMessage.contains("null array element")))
    // mismatched lengths: a prefix dot would mask corrupt vectors
    val ragged = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val e2 = intercept[Exception] {
      ragged.select(GraftExpressions.dot_product(col("a"), col("b"))).collect()
    }
    assert(e2.getMessage.contains("length mismatch")
      || Option(e2.getCause).exists(_.getMessage.contains("length mismatch")))
    // excise_spans: ends shorter than starts must error, not read OOB
    val spans = Seq((Seq("a", "b", "c"), Seq(0L, 2L), Seq(1L))).toDF("t", "s", "e")
    val e3 = intercept[Exception] {
      spans.select(GraftExpressions.excise_spans(col("t"), col("s"), col("e"))).collect()
    }
    assert(e3.getMessage.contains("length mismatch")
      || Option(e3.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("type errors are reported cleanly") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L), Seq(1.0, 2.0))).toDF("ints", "dbls")
    val e = intercept[Exception] {
      df.select(GraftExpressions.dot_product(col("ints"), col("dbls"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("dot_product") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch") ||
      e.getMessage.toLowerCase.contains("array"))
  }
}
