package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.plans.{LayoutAdvisor, MaterializedAggs}

/** [[graft.plans.RewriteMaterializedAgg]]: a staged per-key rollup must
  * serve every covered aggregate/key-set shape EXACTLY — firing tests
  * compare against the registry-off plan, decline tests pin that the
  * rule left the plan alone. */
class MaterializedAggSpec extends GraftSpec {

  private def liPath = graft.plans.MaterializedJoins.leafPath(Tables.lineitem(spark, sf))
  private val cents = (c: String) => round(col(c) * 100).cast("long")

  /** One staged per-orderkey rollup per JVM, advised from a q18/q21/q4
    * shaped corpus — the product path: the advisor derives the key, the
    * measures and the conditional count from the queries themselves. */
  private lazy val meta: MaterializedAggs.Meta = {
    val name = "maspec_rollup"
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, name))
    if (spark.catalog.tableExists(name)) spark.sql(s"DROP TABLE `$name`")
    val spec = advisedSpec
    val m = MaterializedAggs.stageRollup(spark, spec, name)
    MaterializedAggs.deregister(name) // each test scopes its own registration
    m
  }

  private lazy val advisedSpec: LayoutAdvisor.RollupSpec = {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val corpus = Seq(
      // q18 shape: per-order sum, HAVING, joined back to orders
      li.groupBy(col("l_orderkey").as("b_ok"))
        .agg(sum(cents("l_quantity")).as("b_qty"))
        .filter(col("b_qty") > 100L)
        .join(o, col("b_ok") === col("o_orderkey"))
        .select(col("o_orderkey"), col("b_qty")),
      // q21 shape: per-order min/max + conditional aggregates over a
      // computed boolean carried by a Project below the Aggregate
      li.select(col("l_orderkey"), col("l_suppkey"),
          (col("l_returnflag") === "R").as("r"))
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_suppkey")).as("minS"), max(col("l_suppkey")).as("maxS"),
          min(when(col("r"), col("l_suppkey"))).as("minRS"),
          sum(when(col("r"), 1L).otherwise(0L)).as("nR")),
      // q4 shape: EXISTS → semi join on the filtered fact
      o.join(li.filter(col("l_returnflag") === "R").select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n")))
    val specs = LayoutAdvisor.adviseAggRollups(corpus, minHits = 1)
    val onKey = specs.filter(s => s.fact == "lineitem" && s.keys == Seq("l_orderkey"))
    assert(onKey.size === 1, s"expected one l_orderkey rollup advice, got $specs")
    val s0 = onKey.head
    assert(s0.measures.size >= 6,
      s"sum/min/max/minRS/nR/cond measures expected: ${s0.measures}")
    assert(s0.measures.exists(_.cond.isDefined),
      s"the EXISTS probe must record a conditional count: ${s0.measures}")
    s0
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toIndexedSeq).toIndexedSeq.sortBy(_.mkString("|"))

  private def withMeta[T](m: MaterializedAggs.Meta)(f: => T): T = {
    MaterializedAggs.register(m)
    try f finally MaterializedAggs.deregister(m.catalogTable)
  }

  private def fired(df: DataFrame): Boolean =
    MaterializedAggs.fired(df, meta.catalogTable)

  private def sameOnOff(build: => DataFrame): Unit = {
    val on = withMeta(meta)(rows(build))
    val off = rows(build)
    assert(on === off, "rollup-served result must equal the registry-off result")
  }

  test("q18 shape: per-key sum + downstream join served from the rollup") {
    def q = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey").as("b_ok"))
      .agg(sum(cents("l_quantity")).as("b_qty"))
      .filter(col("b_qty") > 100L)
      .join(Tables.orders(spark, sf), col("b_ok") === col("o_orderkey"))
      .select(col("o_orderkey"), col("b_qty"))
    withMeta(meta) {
      assert(fired(q), s"rollup must serve:\n${q.queryExecution.optimizedPlan}")
      // the replaced subtree reads NO fact-grain lineitem at all
      val readsFact = q.queryExecution.optimizedPlan.collectFirst {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
            if lr.relation.isInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
              lr.relation.asInstanceOf[
                org.apache.spark.sql.execution.datasources.HadoopFsRelation]
                .location.rootPaths.map(_.toString).mkString(",") == liPath => lr
      }
      assert(readsFact.isEmpty, "fact-grain read must be gone")
    }
    assert(!fired(q), "registry off => no rewrite")
    sameOnOff(q)
  }

  test("q21 shape: multi-aggregate with computed CASE inputs served") {
    def q = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_returnflag") === "R").as("r"))
      .groupBy(col("l_orderkey"))
      .agg(min(col("l_suppkey")).as("minS"), max(col("l_suppkey")).as("maxS"),
        min(when(col("r"), col("l_suppkey"))).as("minRS"),
        sum(when(col("r"), 1L).otherwise(0L)).as("nR"))
      .filter(col("minS") =!= col("maxS"))
    withMeta(meta)(assert(fired(q),
      s"computed-input aggregates must match:\n${q.queryExecution.optimizedPlan}"))
    sameOnOff(q)
  }

  test("byShuffledKey's repartition peels (the engine's own q18/q21 authoring)") {
    def q = graft.operators.Aggregates
      .byShuffledKey(Tables.lineitem(spark, sf), col("l_orderkey"),
        col("l_orderkey").as("g_ok"))
      .agg(sum(cents("l_quantity")).as("qty"))
    withMeta(meta)(assert(fired(q),
      s"repartition below the aggregate must peel:\n${q.queryExecution.optimizedPlan}"))
    sameOnOff(q)
  }

  test("q4 shape: EXISTS semi probe becomes a rollup key-set filter") {
    def q = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .join(Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    withMeta(meta) {
      assert(fired(q), s"semi probe must be served:\n${q.queryExecution.optimizedPlan}")
    }
    sameOnOff(q)
  }

  test("NOT EXISTS anti probe is served by the same key set") {
    def q = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    withMeta(meta)(assert(fired(q),
      s"anti probe must be served:\n${q.queryExecution.optimizedPlan}"))
    sameOnOff(q)
  }

  test("key-only filters re-apply on the rollup key (inferred isnotnull included)") {
    def q = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") > 100L)
      .groupBy(col("l_orderkey"))
      .agg(sum(cents("l_quantity")).as("qty"))
    withMeta(meta)(assert(fired(q),
      s"key-bound filter must re-apply:\n${q.queryExecution.optimizedPlan}"))
    sameOnOff(q)
  }

  test("q17 shape: avg decomposed as sum/count arithmetic over two measures") {
    // a separate per-partkey rollup, advised from the q17 subquery
    val li = Tables.lineitem(spark, sf)
    def perPart = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg((sum(cents("l_quantity")).cast(DoubleType) / 100.0 / count(lit(1)))
        .as("avg_qty"))
    val specs = LayoutAdvisor.adviseAggRollups(Seq(perPart), minHits = 1)
    assert(specs.size === 1 && specs.head.keys == Seq("l_partkey"), s"$specs")
    val name = "maspec_perpart"
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, name))
    if (spark.catalog.tableExists(name)) spark.sql(s"DROP TABLE `$name`")
    val m = MaterializedAggs.stageRollup(spark, specs.head, name)
    MaterializedAggs.deregister(name)
    def q = li.join(broadcast(Tables.part(spark, sf)
        .filter(col("p_brand") === "Brand#23")),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(cents("l_extendedprice")).cast(DoubleType) / 100.0 / 7.0)
        .as("avg_yearly"))
    val on = { MaterializedAggs.register(m)
      try {
        val df = q
        assert(MaterializedAggs.fired(df, name),
          s"per-part rollup must serve the decorrelated subquery:\n" +
            df.queryExecution.optimizedPlan)
        rows(df)
      } finally MaterializedAggs.deregister(name) }
    assert(on === rows(q))
  }

  test("declines: non-key filter that matches no recorded condition") {
    def q = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "A") // recorded cond is 'R'
      .groupBy(col("l_orderkey"))
      .agg(sum(cents("l_quantity")).as("qty"))
    withMeta(meta)(assert(!fired(q)))
    sameOnOff(q)
  }

  test("declines: unmatched aggregate expression / wrong grouping / extra column") {
    def wrongAgg = Tables.lineitem(spark, sf).groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice")).as("x")) // never staged
    def wrongKey = Tables.lineitem(spark, sf).groupBy(col("l_suppkey"))
      .agg(sum(cents("l_quantity")).as("qty"))
    def extraCol = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"), col("l_linestatus"))
      .agg(sum(cents("l_quantity")).as("qty"))
    withMeta(meta) {
      assert(!fired(wrongAgg), "unstaged measure must decline")
      assert(!fired(wrongKey), "different key must decline")
      assert(!fired(extraCol), "wider grouping must decline")
    }
    sameOnOff(wrongAgg); sameOnOff(wrongKey); sameOnOff(extraCol)
  }

  test("declines: grouping passthrough of a NON-key column") {
    // aggregate expressions referencing non-key columns outside the
    // aggregate functions cannot come from the rollup
    def q = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), (col("l_orderkey") % 7).as("d"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
      .select(col("l_orderkey"), col("n"))
    // this one is servable IF count(1) was staged — pin only that the
    // engine never crashes and results stay equal either way
    sameOnOff(q)
  }

  test("freshness: a base append after staging declines the rewrite") {
    // private copy of the fact so the append cannot disturb other tests
    val dir = java.nio.file.Files.createTempDirectory("maspec_fresh")
    sys.addShutdownHook(GateFixtures.deleteRecursively(dir))
    val base = dir.resolve("fact").toString
    Tables.lineitem(spark, sf).limit(500).write.mode("overwrite").parquet(base)
    val factPath = graft.plans.MaterializedJoins.leafPath(spark.read.parquet(base))
    def corpusQ = spark.read.parquet(base).groupBy(col("l_orderkey"))
      .agg(sum(cents("l_quantity")).as("qty"))
    val spec = LayoutAdvisor.adviseAggRollups(Seq(corpusQ), minHits = 1).head
    val name = "maspec_fresh"
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, name))
    if (spark.catalog.tableExists(name)) spark.sql(s"DROP TABLE `$name`")
    val m = MaterializedAggs.stageRollup(spark, spec, name)
    MaterializedAggs.register(m)
    try {
      assert(MaterializedAggs.fired(corpusQ, name), "fresh base must serve")
      // APPEND to the base — the staged per-key sums are now stale
      Tables.lineitem(spark, sf).limit(100).write.mode("append").parquet(base)
      spark.catalog.refreshByPath(base)
      val drifted = corpusQ
      assert(!MaterializedAggs.fired(drifted, name),
        s"drifted base must decline:\n${drifted.queryExecution.optimizedPlan}")
      // and the correct (recomputed) result flows — 600 rows' worth
      val served = rows(drifted)
      MaterializedAggs.deregister(name)
      assert(served === rows(corpusQ), "declined rewrite must equal flat result")
      // attach over the drifted base must refuse loudly
      intercept[IllegalArgumentException] {
        MaterializedAggs.attachRollup(spark, spec, name + "2",
          java.nio.file.Paths.get(wh, name).toString)
      }
    } finally MaterializedAggs.deregister(name)
  }

  test("attachRollup restores the registration from the sidecar") {
    val staged = meta // ensure staged
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val src = java.nio.file.Paths.get(wh, staged.catalogTable)
    val aside = java.nio.file.Files.createTempDirectory("maspec_attach")
    sys.addShutdownHook(GateFixtures.deleteRecursively(aside))
    java.nio.file.Files.walk(src).forEach { p =>
      val t = aside.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val name2 = staged.catalogTable + "2"
    if (spark.catalog.tableExists(name2)) spark.sql(s"DROP TABLE `$name2`")
    val attached = MaterializedAggs.attachRollup(
      spark, advisedSpec, name2, aside.toString)
    MaterializedAggs.deregister(name2)
    assert(attached === staged.copy(catalogTable = name2))
    // drifted spec (different key) must refuse
    val drifted = advisedSpec.copy(keys = Seq("l_suppkey"))
    intercept[IllegalArgumentException] {
      MaterializedAggs.attachRollup(spark, drifted, name2 + "x", aside.toString)
    }
  }

  test("stats: the rollup's key is recorded ≈unique, blocking useless pre-aggs") {
    val wh = graft.plans.TableStats.warehouseOf(spark)
    val st = graft.plans.TableStats.lookup(wh, meta.catalogTable)
    assert(st.exists(_.uniqueish(meta.keys.head)),
      s"stageRollup must record key uniqueness: $st")
  }

  test("rollup key-set serve composes with EagerAggregation's inserted distinct") {
    // force the Eager shape by hand: Aggregate(key, key, Filter(f, fact))
    def q = {
      val dd = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")).distinct()
      Tables.orders(spark, sf)
        .join(dd, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    }
    withMeta(meta)(assert(fired(q),
      s"filtered DISTINCT on the key must be served:\n${q.queryExecution.optimizedPlan}"))
    sameOnOff(q)
  }

  // ---------------- composite keys + coarser-grain re-aggregation
  // (round-12b: the classic materialized-view rewrite — a query
  // grouping a SUBSET of the rollup's keys, with predicates on key
  // columns, is re-aggregated from the stored partials)

  /** Composite rollups advised from a q1/q6-shaped corpus: the
    * advisor folds the FILTER columns into the key (grouping columns
    * first, predicate columns appended sorted) so the predicates
    * become key-only at rewrite time. */
  private lazy val compositeMetas: Seq[MaterializedAggs.Meta] = {
    import org.apache.spark.sql.types.TimestampType
    val li = Tables.lineitem(spark, sf)
    val corpus = Seq(
      // q1 shape: two-column grouping + a discount bound (11 distinct
      // values at every SF — the folded key set reduces GUARANTEED at
      // any scale; a shipdate bound is the same mechanism but its NDV
      // ~= rows at toy SF, where the product guard rightly declines)
      li.filter(col("l_discount") <= 0.04)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(cents("l_extendedprice")).as("s"), count(lit(1)).as("n")),
      // q6 shape: GLOBAL aggregate, three key-foldable predicates
      li.filter(col("l_discount").between(0.02, 0.04) && col("l_quantity") < 20)
        .agg(sum(cents("l_extendedprice")).as("rev"), count(lit(1)).as("n")))
    val specs = LayoutAdvisor.adviseAggRollups(corpus, minHits = 1)
    val q1k = specs.find(_.keys == Seq("l_returnflag", "l_linestatus", "l_discount"))
    val q6k = specs.find(_.keys == Seq("l_discount", "l_quantity"))
    assert(q1k.isDefined && q6k.isDefined,
      s"advisor must fold predicate columns into composite keys: $specs")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq(q1k.get -> "maspec_q1keys", q6k.get -> "maspec_q6keys").map {
      case (spec, name) =>
        GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, name))
        if (spark.catalog.tableExists(name)) spark.sql(s"DROP TABLE `$name`")
        val m = MaterializedAggs.stageRollup(spark, spec, name)
        MaterializedAggs.deregister(name)
        m
    }
  }

  private def withMetas[T](ms: Seq[MaterializedAggs.Meta])(f: => T): T = {
    ms.foreach(MaterializedAggs.register)
    try f finally ms.foreach(m => MaterializedAggs.deregister(m.catalogTable))
  }

  test("q1 shape: subset grouping re-aggregates stored partials (round-12b)") {
    def q = Tables.lineitem(spark, sf)
      .filter(col("l_discount") <= 0.04)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(cents("l_extendedprice")).as("s"), count(lit(1)).as("n"))
    val ms = compositeMetas
    withMetas(ms) {
      assert(MaterializedAggs.fired(q, ms.head.catalogTable),
        s"coarser-grain serve must fire:\n${q.queryExecution.optimizedPlan}")
      // the served plan reads NO fact-grain lineitem
      val readsFact = q.queryExecution.optimizedPlan.exists {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString).mkString(",") == liPath
        case _ => false
      }
      assert(!readsFact, "fact-grain read must be gone")
    }
    val on = withMetas(ms)(rows(q))
    assert(on === rows(q), "re-aggregated result must equal the direct result")
  }

  test("q6 shape: GLOBAL filtered sum served over the composite rollup") {
    def q = Tables.lineitem(spark, sf)
      .filter(col("l_discount").between(0.02, 0.04) && col("l_quantity") < 20)
      .agg(sum(cents("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
    val ms = compositeMetas
    withMetas(ms) {
      assert(MaterializedAggs.fired(q, ms(1).catalogTable),
        s"global coarser serve must fire:\n${q.queryExecution.optimizedPlan}")
    }
    val on = withMetas(ms)(rows(q))
    assert(on === rows(q))
  }

  test("a DIFFERENT key-column predicate re-applies on the rollup (no re-advice)") {
    // staged for between(0.02,0.04): any predicate over key columns is
    // key-only at rewrite time, including ones never seen at advice
    def q = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") === 5.0 && col("l_discount") > 0.05)
      .agg(sum(cents("l_extendedprice")).as("rev"))
    val ms = compositeMetas
    withMetas(ms)(assert(MaterializedAggs.fired(q, ms(1).catalogTable),
      s"unseen key predicate must still serve:\n${q.queryExecution.optimizedPlan}"))
    assert(withMetas(ms)(rows(q)) === rows(q))
  }

  test("global count over a filtered-empty rollup is 0, not null") {
    def q = Tables.lineitem(spark, sf)
      .filter(col("l_discount") > 1.0) // matches nothing
      .agg(count(lit(1)).as("n"))
    val ms = compositeMetas
    // both composite rollups carry l_discount — EITHER may serve
    withMetas(ms)(assert(ms.exists(m => MaterializedAggs.fired(q, m.catalogTable)),
      s"empty-result global count must serve:\n${q.queryExecution.optimizedPlan}"))
    assert(withMetas(ms)(rows(q)) === Seq(Seq(0L)))
    assert(rows(q) === Seq(Seq(0L)))
  }

  test("coarser grain declines non-decomposable and distinct aggregates") {
    // exact-grain advice records ANY aggregate (stored FINAL values) —
    // stage an avg at full grain, then query it one level coarser
    val li = Tables.lineitem(spark, sf)
    def fullGrain = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(avg(col("l_quantity")).as("aq"))
    val specs = LayoutAdvisor.adviseAggRollups(Seq(fullGrain), minHits = 1)
    assert(specs.size === 1 &&
      specs.head.keys == Seq("l_returnflag", "l_linestatus"), s"$specs")
    val name = "maspec_avg2"
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, name))
    if (spark.catalog.tableExists(name)) spark.sql(s"DROP TABLE `$name`")
    val m = MaterializedAggs.stageRollup(spark, specs.head, name)
    MaterializedAggs.deregister(name)
    // exact grain: avg serves as a stored FINAL value
    withMeta(m)(assert(MaterializedAggs.fired(fullGrain, name),
      s"exact-grain avg must serve:\n${fullGrain.queryExecution.optimizedPlan}"))
    assert(withMeta(m)(rows(fullGrain)) === rows(fullGrain))
    // coarser grain: a bare Average cannot re-aggregate — decline
    def coarser = li.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("aq"))
    withMeta(m)(assert(!MaterializedAggs.fired(coarser, name),
      s"coarser avg must DECLINE:\n${coarser.queryExecution.optimizedPlan}"))
    // distinct aggregates never re-aggregate
    def dq = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_linestatus")).as("d"))
    withMeta(m)(assert(!MaterializedAggs.fired(dq, name)))
  }

  test("incremental refresh: append-only base growth merges the delta (round-12b)") {
    // private copy of the fact so appends cannot disturb other tests
    val dir = java.nio.file.Files.createTempDirectory("maspec_refresh")
    sys.addShutdownHook(GateFixtures.deleteRecursively(dir))
    val base = dir.resolve("fact").toString
    Tables.lineitem(spark, sf).limit(500).write.mode("overwrite").parquet(base)
    def corpusQ = spark.read.parquet(base).groupBy(col("l_orderkey"))
      .agg(sum(cents("l_quantity")).as("qty"), count(lit(1)).as("n"),
        min(cents("l_extendedprice")).as("mn"),
        max(cents("l_extendedprice")).as("mx"))
    val spec = LayoutAdvisor.adviseAggRollups(Seq(corpusQ), minHits = 1).head
    val name = "maspec_refresh"
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    for (n <- Seq(name, name + "__refreshing", name + "__prerefresh")) {
      if (spark.catalog.tableExists(n)) spark.sql(s"DROP TABLE `$n`")
      GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, n))
    }
    val m = MaterializedAggs.stageRollup(spark, spec, name)
    MaterializedAggs.deregister(name)
    // fresh base → refresh is a no-op
    assert(MaterializedAggs.refreshRollup(spark, m) === m)
    MaterializedAggs.deregister(name)
    // APPEND: overlapping keys get merged partials, new keys appear
    Tables.lineitem(spark, sf).limit(800).write.mode("append").parquet(base)
    spark.catalog.refreshByPath(base)
    withMeta(m)(assert(!MaterializedAggs.fired(corpusQ, name),
      "stale rollup must decline before the refresh"))
    val fresh = MaterializedAggs.refreshRollup(spark, m) // registers
    try {
      assert(fresh.fingerprint !== m.fingerprint)
      assert(MaterializedAggs.fired(corpusQ, name),
        s"refreshed rollup must serve:\n${corpusQ.queryExecution.optimizedPlan}")
      val served = rows(corpusQ)
      MaterializedAggs.deregister(name)
      assert(served === rows(corpusQ),
        "delta-merged rollup must equal the direct result over the grown base")
    } finally MaterializedAggs.deregister(name)
    // a non-mergeable measure (avg stored as a FINAL value) refuses
    def avgQ = spark.read.parquet(base).groupBy(col("l_orderkey"))
      .agg(avg(col("l_quantity")).as("a"))
    val avgSpec = LayoutAdvisor.adviseAggRollups(Seq(avgQ), minHits = 1).head
    val avgName = "maspec_refresh_avg"
    if (spark.catalog.tableExists(avgName)) spark.sql(s"DROP TABLE `$avgName`")
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, avgName))
    val avgMeta = MaterializedAggs.stageRollup(spark, avgSpec, avgName)
    MaterializedAggs.deregister(avgName)
    Tables.lineitem(spark, sf).limit(100).write.mode("append").parquet(base)
    spark.catalog.refreshByPath(base)
    val avgRes = try Left(MaterializedAggs.refreshRollup(spark, avgMeta))
      catch { case e: IllegalArgumentException => Right(e.getMessage) }
    MaterializedAggs.deregister(avgName)
    assert(avgRes.isRight, s"avg refresh must refuse; got $avgRes " +
      s"(measures=${avgMeta.measures})")
    // non-append drift (a STAGED file disappeared) refuses — the file
    // to delete comes from the refreshed sidecar's own inventory
    // (deleting an arbitrary parquet file could hit a post-refresh
    // delta file, which IS still append-only growth)
    val sidecar = java.nio.file.Paths.get(wh, name,
      MaterializedAggs.RollupSidecar)
    val stagedLine = java.nio.file.Files.readAllLines(sidecar)
      .toArray.map(_.toString).collectFirst {
        case l if l.startsWith("file\t") => l.stripPrefix("file\t")
      }.get
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      stagedLine.substring(0, stagedLine.lastIndexOf(' '))))
    spark.catalog.refreshByPath(base)
    intercept[IllegalArgumentException] {
      MaterializedAggs.refreshRollup(spark, fresh)
    }
  }

  test("composite advice requires a GUARANTEED reduction (NDV product bound)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("agg_prod")
    sys.addShutdownHook(GateFixtures.deleteRecursively(dir))
    (1L to 4000L).map(i => (i, i % 7L, i % 11L, i * 2.0))
      .toDF("u", "g", "w", "v")
      .write.parquet(dir.resolve("t.parquet").toString)
    val df = spark.read.parquet(dir.resolve("t.parquet").toString)
    // grouping g + filter on near-unique u → composite (g, u): the NDV
    // product bound (7 × ~4000) cannot prove reduction → SKIPPED (the
    // rollup write would cost a fact-sized shuffle for nothing)
    val skip = LayoutAdvisor.adviseAggRollups(
      Seq(df.filter(col("u") < 100L).groupBy(col("g"))
        .agg(sum(col("v")).as("s"))), minHits = 1)
    assert(skip.isEmpty, s"near-fact-grain composite must be declined: $skip")
    // same shape over a low-NDV predicate column → advised (7 × 11 ≪ rows)
    val ok = LayoutAdvisor.adviseAggRollups(
      Seq(df.filter(col("w") < 5L).groupBy(col("g"))
        .agg(sum(col("v")).as("s"))), minHits = 1)
    assert(ok.size === 1 && ok.head.keys == Seq("g", "w"),
      s"guaranteed-reduction composite must be advised: $ok")
  }

  test("decimal re-sum casts back to the query's result type, bit-exact") {
    // the q1 DECIMAL idiom: sum(cast(x as decimal(12,2))) — the re-sum
    // widens to decimal(32,2) and must cast back to decimal(22,2)
    val dec = (c: String) => col(c).cast(DecimalType(12, 2))
    def q1dec = Tables.lineitem(spark, sf)
      .filter(col("l_discount") <= 0.04)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec("l_quantity")).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"))
    val specs = LayoutAdvisor.adviseAggRollups(Seq(q1dec), minHits = 1)
    assert(specs.size === 1 && specs.head.keys ==
      Seq("l_returnflag", "l_linestatus", "l_discount"), s"$specs")
    val name = "maspec_dec"
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, name))
    if (spark.catalog.tableExists(name)) spark.sql(s"DROP TABLE `$name`")
    val m = MaterializedAggs.stageRollup(spark, specs.head, name)
    MaterializedAggs.deregister(name)
    withMeta(m) {
      assert(MaterializedAggs.fired(q1dec, name),
        s"decimal re-sum must serve:\n${q1dec.queryExecution.optimizedPlan}")
      assert(q1dec.schema("sum_qty").dataType === DoubleType)
    }
    assert(withMeta(m)(rows(q1dec)) === rows(q1dec))
  }
}
