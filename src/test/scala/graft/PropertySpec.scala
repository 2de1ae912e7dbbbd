package graft

import graft.operators.{BlockDedup, Partitioners, Rebatch, SkewJoin}
import graft.sources.TabularReader
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the invariants the reference's rebatch/dedup
  * machinery guarantees (SURVEY §5): layout independence, permutation
  * preservation, compress/restore identity, pad/clip shape.
  * (scalacheck generators sampled manually — the scalatest bridge
  * artifact is not in the offline cache.) */
class PropertySpec extends GraftSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  lazy val events = Tables.events(spark, sf).cache()

  test("property: aggregates are invariant under any partition layout") {
    val base = events.groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    samples(Gen.choose(1, 40), 5).foreach { n =>
      val got = events.repartition(n).groupBy("event_type").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === base, s"layout $n")
    }
  }

  test("property: seeded shuffle is always a permutation") {
    val ids = events.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    samples(Gen.choose(Long.MinValue, Long.MaxValue), 5).foreach { seed =>
      val got = Partitioners.shuffleRows(events, seed)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === ids, s"seed $seed")
    }
  }

  test("property: padToLength always yields the declared shape") {
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(Gen.listOf(Gen.choose(-100L, 100L)))
    samples(Gen.zip(rowsGen, Gen.choose(1, 12)), 10).foreach { case (rows, n) =>
      val df = rows.toDF("xs")
      val lens = df.select(TabularReader.padToLength(col("xs"), Some(n), 0L, LongType))
        .collect().map(_.getSeq[Long](0).length).toSet
      assert(lens === Set(n), s"target $n")
    }
  }

  test("property: block dedup compress->restore is the identity") {
    samples(Gen.choose(2, 30), 3).foreach { nUsers =>
      val sub = events.filter(col("user_id") < nUsers)
      val compressed = BlockDedup.compress(sub, col("user_id"), col("event_id"), Seq("event_type"))
      val restored = BlockDedup.restore(compressed, "event_type")
        .select(col("__ord").as("event_id"), col("event_type"))
      val orig = sub.select("event_id", "event_type")
      assert(restored.exceptAll(orig).count() === 0)
      assert(orig.exceptAll(restored).count() === 0)
    }
  }

  test("salted join returns exactly the plain join's rows") {
    val dim = Tables.embeddings(spark, sf).select(col("vec_id").as("user_id"), col("label"))
    val plain = events.select("event_id", "user_id").join(dim, Seq("user_id"), "inner")
    val salted = SkewJoin.salted(events.select("event_id", "user_id"), dim, "user_id", 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("property: hash salt is layout-invariant (same salt per row under any partitioning)") {
    // the docstring's determinism claim: with saltBy row-identity columns,
    // the event_id -> salt assignment must not depend on the scan layout
    def saltsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.withColumn("__salt", SkewJoin.saltColumn(Seq("event_id"), 8, 0x5a17))
        .select("event_id", "__salt")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val base = saltsOf(events)
    samples(Gen.choose(1, 40), 4).foreach { n =>
      assert(saltsOf(events.repartition(n)) === base, s"layout $n")
    }
    // and rows of one hot key really spread over multiple salts
    val hot = events.groupBy("user_id").count().orderBy(col("count").desc)
      .limit(1).collect().head.getLong(0)
    val hotSalts = events.filter(col("user_id") === hot)
      .select(SkewJoin.saltColumn(Seq("event_id"), 8, 0x5a17))
      .collect().map(_.getInt(0)).toSet
    assert(hotSalts.size > 1, s"hot key $hot not spread: $hotSalts")
  }

  test("salted join with saltBy equals the plain join under a changed layout") {
    val dim = Tables.embeddings(spark, sf).select(col("vec_id").as("user_id"), col("label"))
    val facts = events.select("event_id", "user_id")
    val plain = facts.join(dim, Seq("user_id"), "inner")
    val saltedRepart = SkewJoin.salted(
      facts.repartition(7), dim, "user_id", 8, saltBy = Seq("event_id"))
    assert(saltedRepart.count() === plain.count())
    assert(saltedRepart.exceptAll(plain).count() === 0)
  }

  test("salted aggregation equals plain aggregation") {
    val plain = events.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = SkewJoin.saltedAgg(events, col("user_id"), 8,
      partialAggs = Seq(count(lit(1)).as("pn")),
      finalAggs = Seq(sum(col("pn")).as("n")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted === plain)
  }

  test("rebatch: exact batch sizes with and without remainder") {
    val df = events.select("event_id").limit(503)
    val sizes = Rebatch.batches(df, 100).map(_.size).toSeq
    assert(sizes.init.forall(_ == 100) && sizes.last == 3)
    val dropped = Rebatch.batches(df, 100, dropRemainder = true).map(_.size).toSeq
    assert(dropped.forall(_ == 100) && dropped.size == 5)
  }

  test("corrupt file skipping (reference skip_corrupted_data)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    events.select("event_id").limit(10).write.mode("overwrite").parquet(dir)
    // plant a corrupt .parquet alongside real ones
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part-corrupt.parquet"),
      "not a parquet file".getBytes)
    val ok = TabularReader.fromParquet(spark, Seq(dir),
      TabularReader.Options(skipCorrupted = true))
    assert(ok.count() === 10)
  }
}
