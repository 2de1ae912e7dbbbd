package graft

import graft.functions.Metrics
import org.apache.spark.sql.functions._

class MetricsSpec extends GraftSpec {

  test("mrrAtK and calibrationError match hand-computed tiny cases") {
    import spark.implicits._
    // two groups: g1 first relevant at pos 2, g2 has none in top-k
    val df = Seq(
      (1L, 0, 9.0, 1L), (1L, 1, 5.0, 2L), (1L, 1, 1.0, 3L),
      (2L, 0, 9.0, 4L), (2L, 0, 5.0, 5L))
      .toDF("g", "y", "s", "o")
    val mrr = Metrics.mrrAtK(df, col("g"), col("y") === 1, col("s"), col("o"), k = 10).head()
    assert(mrr.getLong(1) === 2L)
    assert(math.abs(mrr.getDouble(0) - (0.5 + 0.0) / 2) < 1e-9)
    // calibration: bin0 holds p=.05 (y=0); bin9 holds p={.95,.95} (y=1,0)
    val cal = Seq((0, 0.05), (1, 0.95), (0, 0.95)).toDF("y", "p")
    val ece = Metrics.calibrationError(cal, col("y"), col("p"), bins = 10).head().getDouble(0)
    val want = (math.abs(0.05 - 0.0) * 1 + math.abs(0.95 - 0.5) * 2) / 3
    assert(math.abs(ece - want) < 1e-9)
  }

  test("ndcgAtK matches a hand-computed tiny ranking") {
    import spark.implicits._
    // one group, 4 items: rel by id = (3, 2, 0, 1), model scores rank
    // them (id2, id1, id4, id3) -> positions (2, 1, 4, 3)
    val df = Seq(
      (1L, 3.0, 0.9, 1L), (1L, 2.0, 1.5, 2L), (1L, 0.0, 0.1, 3L), (1L, 1.0, 0.4, 4L))
      .toDF("g", "r", "s", "o")
    def gain(rel: Double, pos: Int) = (math.pow(2, rel) - 1) / (math.log(pos + 1) / math.log(2))
    val dcg = gain(2, 1) + gain(3, 2) + gain(1, 3) + gain(0, 4)
    val idcg = gain(3, 1) + gain(2, 2) + gain(1, 3) + gain(0, 4)
    val got = Metrics.ndcgAtK(df, col("g"), col("r"), col("s"), col("o"), k = 10)
      .head().getDouble(1)
    assert(math.abs(got - dcg / idcg) < 1e-9)
    // @k truncation: k=1 compares only the top positions
    val got1 = Metrics.ndcgAtK(df, col("g"), col("r"), col("s"), col("o"), k = 1)
      .head().getDouble(1)
    assert(math.abs(got1 - gain(2, 1) / gain(3, 1)) < 1e-9)
  }

  test("accuracy golden") {
    import spark.implicits._
    val df = Seq((1, 1), (1, 0), (0, 0), (0, 0)).toDF("label", "pred")
    val acc = df.agg(Metrics.accuracy(col("label"), col("pred")).as("a"))
      .collect().head.getDouble(0)
    assert(acc === 0.75)
  }

  test("weightedMean golden") {
    import spark.implicits._
    val df = Seq((1.0, 1.0), (3.0, 3.0)).toDF("v", "w")
    val m = df.agg(Metrics.weightedMean(col("v"), col("w")).as("m"))
      .collect().head.getDouble(0)
    assert(m === 2.5) // (1*1 + 3*3) / (1+3)
  }

  test("aucExact golden: perfect, inverted, random separability") {
    import spark.implicits._
    val perfect = Seq((0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9)).toDF("y", "s")
    assert(Metrics.aucExact(perfect, col("y") === 1, col("s"))
      .collect().head.getDouble(0) === 1.0)
    val inverted = Seq((1, 0.1), (1, 0.2), (0, 0.8), (0, 0.9)).toDF("y", "s")
    assert(Metrics.aucExact(inverted, col("y") === 1, col("s"))
      .collect().head.getDouble(0) === 0.0)
    // all-tied scores -> AUC 0.5 by average-rank convention
    val tied = Seq((1, 0.5), (0, 0.5), (1, 0.5), (0, 0.5)).toDF("y", "s")
    assert(Metrics.aucExact(tied, col("y") === 1, col("s"))
      .collect().head.getDouble(0) === 0.5)
  }

  test("ThresholdedAuc approximates exact AUC within threshold resolution") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { _ =>
      val y = rnd.nextInt(2)
      // noisy separable scores
      val s = math.min(1.0, math.max(0.0, 0.35 * y + 0.5 * rnd.nextDouble()))
      (y.toDouble, s)
    }
    val df = rows.toDF("y", "s")
    val exact = Metrics.aucExact(df, col("y") === 1.0, col("s"))
      .collect().head.getDouble(0)
    val agg = udaf(new Metrics.ThresholdedAuc(200))
    val approx = df.agg(agg(col("y"), col("s")).as("auc")).collect().head.getDouble(0)
    assert(math.abs(exact - approx) < 0.01, s"exact=$exact approx=$approx")
  }

  test("MeanAggregator matches weightedMean") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (5.0, 1.0), (2.0, 0.5)).toDF("v", "w")
    val agg = udaf(new Metrics.MeanAggregator)
    val a = df.agg(agg(col("v"), col("w")).as("m")).collect().head.getDouble(0)
    val b = df.agg(Metrics.weightedMean(col("v"), col("w"))).collect().head.getDouble(0)
    assert(math.abs(a - b) < 1e-12)
  }

  test("aucExact ignores null and NaN scores (undefined rank order)") {
    import spark.implicits._
    val clean = Seq((0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9)).toDF("y", "s")
    val dirty = Seq[(Int, java.lang.Double)](
      (0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9),
      (1, null), (0, null), (1, Double.NaN), (0, Double.NaN)).toDF("y", "s")
    val a = Metrics.aucExact(clean, col("y") === 1, col("s")).collect().head.getDouble(0)
    val b = Metrics.aucExact(dirty, col("y") === 1, col("s")).collect().head.getDouble(0)
    assert(a === b && a === 1.0)
  }

  test("aucExact: null labels excluded; an infinite score ranks but does not flatten buckets") {
    import spark.implicits._
    val clean = Seq((0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9)).toDF("y", "s")
    // null labels would otherwise count as negatives (sum skips, count doesn't)
    val nullLab = Seq[(java.lang.Integer, Double)](
      (0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9), (null, 0.5), (null, 0.95))
      .toDF("y", "s")
    val a = Metrics.aucExact(clean, col("y") === 1, col("s")).collect().head.getDouble(0)
    val b = Metrics.aucExact(nullLab, col("y") === 1, col("s")).collect().head.getDouble(0)
    assert(a === b && a === 1.0)
    // +Inf is a legitimate (top-ranked) score; the finite-domain stats
    // keep everyone else in spread-out buckets and the value is exact
    val withInf = Seq((0, 0.1), (0, 0.2), (1, 0.8), (1, Double.PositiveInfinity))
      .toDF("y", "s")
    val c = Metrics.aucExact(withInf, col("y") === 1, col("s")).collect().head.getDouble(0)
    assert(c === 1.0)
  }

  test("ThresholdedAuc rejects degenerate threshold counts at construction") {
    intercept[IllegalArgumentException] { new Metrics.ThresholdedAuc(1) }
  }

  test("MeanAggregator (Kahan) is accurate under badly conditioned sums") {
    import spark.implicits._
    // 1e12 + many tiny values: plain double accumulation loses the tail
    val rows = (1.0e12, 1.0) +: Seq.fill(10000)((1e-4, 1.0))
    val df = rows.toDF("v", "w").repartition(8)
    val agg = udaf(new Metrics.MeanAggregator)
    val got = df.agg(agg(col("v"), col("w"))).collect().head.getDouble(0)
    val want = (1.0e12 + 10000 * 1e-4) / 10001.0
    assert(math.abs(got - want) / want < 1e-15, s"got=$got want=$want")
  }

  test("gaucSorted equals the window-based gauc (incl. ties, single-class drop)") {
    import spark.implicits._
    // ties within and across label classes, a single-class group (20),
    // groups landing in different partitions
    val df = Seq(
      (10L, 1, 0.5), (10L, 0, 0.5), (10L, 1, 0.9), (10L, 0, 0.1), (10L, 0, 0.9),
      (11L, 1, 0.3), (11L, 0, 0.3), (11L, 1, 0.3), (11L, 0, 0.7),
      (20L, 1, 0.4), (20L, 1, 0.6),
      (30L, 0, 0.2), (30L, 1, 0.8)
    ).toDF("g", "y", "s").repartition(5)
    val a = Metrics.gauc(df, col("g"), col("y") === 1, col("s")).head.getDouble(0)
    val b = Metrics.gaucSorted(df, col("g"), col("y") === 1, col("s")).head.getDouble(0)
    assert(a === b)
    val perA = Metrics.gaucPerGroup(df, col("g"), col("y") === 1, col("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    val perB = Metrics.gaucPerGroupSorted(df, col("g"), col("y") === 1, col("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(perA === perB)
    assert(!perA.exists(_._1 == 20L)) // single-class group dropped by both
  }

  test("gaucSorted equals gauc on the events table") {
    val ev = Tables.events(spark, sf)
    val a = Metrics.gauc(ev, col("user_id"), col("event_type") === "error", col("value"))
      .select(round(col("gauc"), 9)).head.getDouble(0)
    val b = Metrics.gaucSorted(ev, col("user_id"), col("event_type") === "error", col("value"))
      .select(round(col("gauc"), 9)).head.getDouble(0)
    assert(a === b)
  }

  test("gaucPerGroup drops single-class groups") {
    import spark.implicits._
    val df = Seq(
      (1L, 1, 0.9), (1L, 0, 0.1), // mixed -> kept, auc 1.0
      (2L, 1, 0.5), (2L, 1, 0.6)) // all-positive -> dropped
      .toDF("g", "y", "s")
    val rows = Metrics.gaucPerGroup(df, col("g"), col("y") === 1, col("s")).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 1L)
    assert(rows.head.getDouble(1) === 1.0)
  }
}
