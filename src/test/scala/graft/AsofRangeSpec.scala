package graft

import graft.operators.{AsofJoin, Contamination, RangeJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join, binned range join, contamination and repetition metrics:
  * each checked against a brute-force formulation of the same
  * semantics, plus the layout-invariance and plan-shape properties the
  * scale story depends on. */
class AsofRangeSpec extends GraftSpec {

  private def events = Tables.events(spark, sf)
  private def purchases = events
    .filter(col("event_type") === "purchase")
    .select(col("user_id"), col("ts"), col("event_id"))

  /** Brute-force backward as-of: inequality join + keep max right ts
    * per left row (small-data oracle; the operator must never plan
    * this shape). */
  private def bruteBackward: DataFrame = {
    val e = events.select(col("event_id"), col("user_id"), col("ts"))
    val p = purchases.withColumnRenamed("event_id", "p_id")
      .withColumnRenamed("ts", "p_ts")
    val w = Window.partitionBy(col("event_id")).orderBy(col("p_ts").desc)
    e.join(p, Seq("user_id")).filter(col("p_ts") <= col("ts"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("p_id"))
  }

  test("asof backward matches the brute-force inequality join") {
    val got = AsofJoin.backward(
      events.select(col("event_id"), col("user_id"), col("ts")),
      purchases, Seq("user_id"), "ts", "ts", joinType = "inner", matchedAs = "m")
      .select(col("event_id"), col("m.event_id").as("p_id"))
    assert(got.count() === bruteBackward.count())
    assert(got.exceptAll(bruteBackward).count() === 0)
  }

  test("asof left join keeps unmatched rows with a NULL match") {
    val got = AsofJoin.backward(
      events.select(col("event_id"), col("user_id"), col("ts")),
      purchases, Seq("user_id"), "ts", "ts", joinType = "left", matchedAs = "m")
    assert(got.count() === events.count())
    assert(got.filter(col("m").isNull).count() ===
      events.count() - bruteBackward.count())
  }

  test("asof is layout-invariant: repartitioned inputs give the same result") {
    val e = events.select(col("event_id"), col("user_id"), col("ts"))
    val a = AsofJoin.backward(e, purchases, Seq("user_id"), "ts", "ts",
      joinType = "inner", matchedAs = "m")
      .select(col("event_id"), col("m.event_id").as("p_id"))
    val b = AsofJoin.backward(e.repartition(13), purchases.repartition(3),
      Seq("user_id"), "ts", "ts", joinType = "inner", matchedAs = "m")
      .select(col("event_id"), col("m.event_id").as("p_id"))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("asof tolerance nulls matches older than the budget") {
    val tol = 60L * 1000000L // 1 minute
    val got = AsofJoin.backward(
      events.select(col("event_id"), col("user_id"), col("ts")),
      purchases, Seq("user_id"), "ts", "ts", joinType = "inner",
      matchedAs = "m", toleranceMicros = Some(tol))
    val maxGap = got.agg(max(unix_micros(col("ts")) - unix_micros(col("m.ts"))))
      .head.getLong(0)
    assert(maxGap <= tol)
    // and it's exactly the untoleranced result filtered to the budget
    val unfiltered = AsofJoin.backward(
      events.select(col("event_id"), col("user_id"), col("ts")),
      purchases, Seq("user_id"), "ts", "ts", joinType = "inner", matchedAs = "m")
      .filter(unix_micros(col("ts")) - unix_micros(col("m.ts")) <= tol)
    assert(got.count() === unfiltered.count())
  }

  test("asof forward matches the reversed brute force") {
    val e = events.select(col("event_id"), col("user_id"), col("ts"))
    val p = purchases.withColumnRenamed("event_id", "p_id")
      .withColumnRenamed("ts", "p_ts")
    val w = Window.partitionBy(col("event_id")).orderBy(col("p_ts").asc)
    val brute = e.join(p, Seq("user_id")).filter(col("p_ts") >= col("ts"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("p_id"))
    val got = AsofJoin.forward(e, purchases, Seq("user_id"), "ts", "ts",
      joinType = "inner", matchedAs = "m")
      .select(col("event_id"), col("m.event_id").as("p_id"))
    assert(got.count() === brute.count())
    assert(got.exceptAll(brute).count() === 0)
  }

  test("asof: NULL timestamps match nothing and receive no match") {
    import spark.implicits._
    val right = Seq((1L, Some(100L), "real"), (1L, None, "phantom"))
      .toDF("k", "sec", "x")
      .withColumn("rts", timestamp_seconds(col("sec"))).drop("sec")
    val left = Seq((1L, Some(50L), 10L), (1L, Some(200L), 11L), (1L, None, 12L))
      .toDF("k", "sec", "lid")
      .withColumn("lts", timestamp_seconds(col("sec"))).drop("sec")
    val got = AsofJoin.backward(left, right, Seq("k"), "lts", "rts")
      .select(col("lid"), col("asof.x"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // lid=10 precedes every real right row -> no match (NOT the phantom);
    // lid=11 matches the 100s row; NULL-ts left -> no match
    assert(got === Map(10L -> None, 11L -> Some("real"), 12L -> None))
    // forward direction: the phantom must not ride the descending scan
    val fwd = AsofJoin.forward(left, right, Seq("k"), "lts", "rts")
      .select(col("lid"), col("asof.x"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(fwd === Map(10L -> Some("real"), 11L -> None, 12L -> None))
  }

  test("asof: duplicate right timestamps resolve to the greatest payload, any layout") {
    import spark.implicits._
    val right = Seq((1L, 100L, "A"), (1L, 100L, "B"), (1L, 100L, "C"))
      .toDF("k", "sec", "x")
      .withColumn("rts", timestamp_seconds(col("sec"))).drop("sec")
    val left = Seq((1L, 150L, 10L)).toDF("k", "sec", "lid")
      .withColumn("lts", timestamp_seconds(col("sec"))).drop("sec")
    def run(r: DataFrame) = AsofJoin.backward(left, r, Seq("k"), "lts", "rts")
      .select(col("asof.x")).collect().head.getString(0)
    // deterministic winner: lexicographically greatest right payload
    assert(run(right) === "C")
    assert(run(right.repartition(7)) === "C")
    assert(run(right.orderBy(col("x").desc)) === "C")
  }

  test("range join equals the inequality join, across bin widths") {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("v_ts"))
    val iv = purchases.select(col("event_id").as("purchase_id"),
      (col("ts") - expr("INTERVAL 1 HOUR")).as("lo"), col("ts").as("hi"))
    val brute = views.join(iv, col("v_ts") >= col("lo") && col("v_ts") < col("hi"))
      .select(col("view_id"), col("purchase_id"))
    // bin == interval length, smaller, and non-divisor widths
    Seq(3600L, 600L, 7200L, 3599L).foreach { secs =>
      val got = RangeJoin.pointsInIntervals(views, iv, "v_ts", "lo", "hi",
        binWidthMicros = secs * 1000000L)
        .select(col("view_id"), col("purchase_id"))
      assert(got.count() === brute.count(), s"binWidth=${secs}s")
      assert(got.exceptAll(brute).count() === 0, s"binWidth=${secs}s")
    }
  }

  test("range join with an equi-key matches the keyed inequality join") {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    val iv = purchases.select(col("user_id"), col("event_id").as("purchase_id"),
      (col("ts") - expr("INTERVAL 4 HOUR")).as("lo"), col("ts").as("hi"))
    val brute = views.as("v").join(iv.as("i"),
        col("v.user_id") === col("i.user_id")
          && col("v_ts") >= col("lo") && col("v_ts") < col("hi"))
      .select(col("view_id"), col("purchase_id"))
    val got = RangeJoin.pointsInIntervals(views, iv, "v_ts", "lo", "hi",
      binWidthMicros = 3600L * 1000000L, keys = Seq("user_id"))
      .select(col("view_id"), col("purchase_id"))
    assert(got.count() === brute.count())
    assert(got.exceptAll(brute).count() === 0)
  }

  test("range join drops empty intervals instead of descending the bin sequence") {
    val views = events.limit(100)
      .select(col("event_id").as("view_id"), col("ts").as("v_ts"))
    val empty = purchases.limit(10).select(col("event_id").as("purchase_id"),
      col("ts").as("lo"), col("ts").as("hi")) // hi == lo: matches nothing
    val got = RangeJoin.pointsInIntervals(views, empty, "v_ts", "lo", "hi",
      binWidthMicros = 3600L * 1000000L)
    assert(got.count() === 0)
  }

  test("range join fanout guard actually fires (not pruned from the plan)") {
    val views = events.limit(10)
      .select(col("event_id").as("view_id"), col("ts").as("v_ts"))
    val wide = purchases.limit(3).select(col("event_id").as("purchase_id"),
      col("ts").as("lo"), (col("ts") + expr("INTERVAL 10 HOURS")).as("hi"))
    // 1-hour bins x 10-hour intervals with a 4-bin cap: the guard must
    // raise (a standalone assert_true column was silently column-pruned)
    val ex = intercept[Exception] {
      RangeJoin.pointsInIntervals(views, wide, "v_ts", "lo", "hi",
        binWidthMicros = 3600L * 1000000L, maxBinsPerInterval = 4).count()
    }
    assert(ex.getMessage.contains("spans more than 4 bins"), ex.getMessage)
  }

  test("asof tolerates a map-typed right column (tie-break skips unorderable fields)") {
    import spark.implicits._
    def t(m: Long) = new java.sql.Timestamp(m)
    val left = Seq((1L, t(100))).toDF("k", "lts")
    val right = Seq((1L, t(50), Map("a" -> 1)), (1L, t(60), Map("b" -> 2)))
      .toDF("k", "rts", "props")
    val got = AsofJoin.backward(left, right, Seq("k"), "lts", "rts")
      .select(col("asof.rts")).collect()
    assert(got.length === 1 && got.head.getTimestamp(0) === t(60))
  }

  test("asof and range joins plan no nested loop and no cartesian product") {
    Seq("asof_join_attribution", "asof_join_forward", "range_join_purchase_window")
      .foreach { q =>
        val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin"), q)
        assert(!p.contains("CartesianProduct"), q)
      }
  }

  test("contamination matches the per-doc array_intersect formulation") {
    val docs = Tables.documents(spark, sf)
    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val got = Contamination.overlap(train, bench, col("doc_id"), col("text"), n = 3)
    // brute force: intersect each train doc's shingle set with the
    // union of all benchmark shingles, materialized as one array
    val benchAll = graft.operators.NearDup
      .shingleHashSets(bench, col("doc_id"), col("text"), 3)
      .agg(array_distinct(flatten(collect_list(col("shingles")))).as("bs"))
    val brute = graft.operators.NearDup
      .shingleHashSets(train, col("doc_id"), col("text"), 3)
      .crossJoin(benchAll)
      .select(col("doc_id"),
        size(array_intersect(col("shingles"), col("bs"))).cast("long").as("hit"),
        size(col("shingles")).cast("long").as("tot"))
      .filter(col("hit") > 0)
      .withColumn("contamination", col("hit").cast("double") / col("tot"))
    assert(got.count() === brute.count())
    assert(got.exceptAll(brute).count() === 0)
  }

  test("row-local top-bigram fraction equals the explode+groupBy formulation") {
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, sf)
      .filter(size(TextFunctions.tokenize(col("text"))) >= 2)
    val got = docs.select(col("doc_id"),
      TextFunctions.topBigramFraction(col("text")).as("f"))
    val ex = docs.select(col("doc_id"), explode(
      TextFunctions.shingles(TextFunctions.tokenize(col("text")), 2)).as("g"))
      .select(col("doc_id"), TextFunctions.polyHash(col("g")).as("h"))
    val brute = ex.groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as("f"))
    assert(got.count() === brute.count())
    assert(got.exceptAll(brute).count() === 0)
  }
}
