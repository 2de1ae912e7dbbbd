package graft

/** Plan-shape regressions: the scale-critical physical-plan properties
  * (pushdown, broadcast, partial aggregation, distributed top-k, no
  * cartesian products) asserted against the actual planned queries so a
  * future refactor can't silently trade them away. */
import org.apache.spark.sql.functions._

class PlanShapeSpec extends GraftSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1: shipdate filter pushed to the parquet scan + map-side partial aggregation") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("partial_sum"))
  }

  test("q6: all value predicates reach the scan") {
    // toString truncates long PushedFilters lists — assert via the data
    // filters, which mirror what was pushed
    val p = plan("q6_forecast_revenue")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.02)"))
    assert(p.contains(">= 0.02") && p.contains("<= 0.04") && p.contains("< 20.0"))
  }

  test("lookup join broadcasts the dimension side") {
    assert(plan("lookup_join").contains("BroadcastHashJoin"))
  }

  test("input layer: every embedding lookup broadcasts; example side never shuffles") {
    val p = plan("input_layer_assemble")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("BM25 broadcasts the query/df sides; corpus tf rows never shuffle by term") {
    val p = plan("text_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the only non-broadcast exchanges are the (query, doc) score
    // aggregate and the per-query top-k window — never a join shuffle
    // of the exploded corpus term rows
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("ordered top-k plans as distributed TakeOrderedAndProject, not a global sort") {
    assert(plan("topk_orders").contains("TakeOrderedAndProject"))
    assert(plan("q3_shipping_priority").contains("TakeOrderedAndProject"))
  }

  test("near-dup pipelines plan no cartesian product") {
    Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_embedding_neardup",
      "dedup_incremental_pairs", "dedup_ingest_novel", "dedup_line_level",
      "dedup_semantic_prune", "graph_pagerank")
      .foreach { q => assert(!plan(q).contains("CartesianProduct"), q) }
  }

  test("KMV sketch plans the distributed top-k, not a global sort") {
    assert(plan("sketch_kmv_distinct").contains("TakeOrderedAndProject"))
  }

  test("KMV overlap: every sketch is a distributed top-k; sketch joins broadcast") {
    val p = plan("sketch_kmv_overlap")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"))
  }

  test("DSIR: bucket-weight joins broadcast; selection is TakeOrderedAndProject") {
    val p = plan("sample_dsir_topn")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("upsert merges with one equi-join, no cartesian") {
    val p = plan("upsert_merge")
    assert(p.contains("FullOuter") && !p.contains("CartesianProduct"))
  }

  test("projection-only scan reads only the projected columns") {
    val p = plan("scan_projection_defaults")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"))
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // Spark's runtime-filter rule injects a bloom filter built from the
    // selective (dim) side into the fact-side scan — the 100 TB shuffle
    // -join analogue of broadcast-join pruning. Defaults gate it behind
    // multi-GB thresholds, so drop them for a local proof that OUR query
    // shapes let the rule fire (a non-deterministic expression or a
    // missing equi-key would silently disable it).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "8GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = Tables.lineitem(spark, sf)
      val urgent = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val p = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"expected a bloom runtime filter on the lineitem scan side:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("host cap pushes a partial WindowGroupLimit below the host exchange") {
    val p = plan("web_host_cap")
    // two WindowGroupLimit nodes: Partial before Exchange, Final after —
    // at most n rows per host per map partition travel
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Exchange"), p)
  }

  test("bucketed per-group aggregate plans NO exchange (layout-carried distribution)") {
    val p = plan("agg_bucketed_pergroup")
    // the write-time bucketing IS the shuffle: the scan reports the
    // hash distribution on l_orderkey, so the per-order rollup —
    // q18/q21's dominant cost as an exchange aggregate — runs with no
    // Exchange node at all
    assert(!p.contains("Exchange"), p.take(3000))
    assert(p.contains("HashAggregate"), p.take(3000))
    assert(p.contains("Bucketed: true"), p.take(3000))
  }

  test("sort-bucketed per-group aggregate STREAMS: SortAggregate, zero Exchange, zero Sort") {
    val p = plan("agg_bucketed_sortstream")
    // write-time sortBy + one file per bucket upgrades the
    // exchange-free rollup to a streaming aggregate: one group's state
    // at a time instead of a groups-sized hash table (x200 2.4→1.6 s)
    assert(p.contains("SortAggregate"), p.take(3000))
    assert(!p.contains("Exchange"), p.take(3000))
    assert(!p.contains("HashAggregate"), p.take(3000))
    assert(!p.contains("+- Sort "), p.take(3000))
    assert(p.contains("Bucketed: true"), p.take(3000))
  }

  test("advisor-produced layout: rollup STREAMS exchange-free off the advised table") {
    val p = plan("layout_advisor_agg")
    // the advisor staged lineitem bucketed+sorted on l_orderkey from
    // the query corpus alone; the per-order rollup over it gets the
    // full streaming plan with no hand-staging
    assert(p.contains("SortAggregate"), p.take(3000))
    assert(!p.contains("Exchange"), p.take(3000))
    assert(p.contains("Bucketed: true"), p.take(3000))
  }

  test("advisor-aligned PAIR: co-located join plans no exchange below the join") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast to pin the co-located shape (spec-scale
      // orders would otherwise broadcast — same discipline as
      // join_bucketed_fact)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("layout_advisor_join")
      val joinIdx = p.indexOf("Join")
      assert(joinIdx >= 0, p.take(3000))
      assert(!p.substring(joinIdx).contains("Exchange"),
        s"expected no exchange below the advisor-aligned join:\n${p.take(3000)}")
      assert("Bucketed: true".r.findAllIn(p).size >= 2, p.take(3000))
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("bucketed fact-fact join plans NO shuffle exchange on either side") {
    // at spec scale the orders side auto-broadcasts (also exchange-free
    // in the shuffle sense, and the right tiny-data plan); disable
    // broadcast to pin the CO-LOCATED shape the layout buys at fact
    // scale — both sides bucketed 8-way on the order key, so the
    // line⋈order join (q9/q12's named blocker as an exchange) plans
    // with no shuffle Exchange below the join
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("join_bucketed_fact")
      val joinIdx = p.indexOf("Join")
      assert(joinIdx >= 0, p.take(3000))
      assert(!p.substring(joinIdx).contains("Exchange"),
        s"expected no exchange below the bucketed join:\n${p.take(3000)}")
      assert("Bucketed: true".r.findAllIn(p).size >= 2, p.take(3000))
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("gram matrix aggregates object buffers map-side; unpack join broadcasts") {
    val p = plan("embedding_gram_matrix")
    // partial ObjectHashAggregate before the single-buffer exchange:
    // rows never shuffle, only one packed buffer per partition
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("classifier scoring is shuffle-free (row-local kernel, no Exchange)") {
    val p = plan("text_classifier_score")
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("linearlogit") || p.contains("LinearLogit"), p.take(2000))
  }

  test("CMS joins the sketch and the total back broadcast; corpus never re-shuffles") {
    val p = plan("sketch_cms_heavy_hitters")
    // sketch (d*w rows) and the 1-row total both broadcast
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("curation pipeline: broadcast anti-join blocklist + partial host-cap limit") {
    val p = plan("pipeline_corpus_curation")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(3000))
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("relational suite: EXISTS/NOT EXISTS plan as hash semi/anti joins, top-ks distribute") {
    // q4's EXISTS is a semi join whose build side is the pre-filtered
    // returned-line keys; q21 stacks a semi AND an anti on the same fact;
    // q22's anti side is the URGENT-order key list. None may degrade to
    // a cartesian or a nested loop over the fact.
    val q4 = plan("q4_order_priority")
    assert(q4.contains("LeftSemi"), q4.take(2000))
    // q21's EXISTS/NOT-EXISTS pair is decorrelated to per-order min/max
    // aggregates — the fact must NOT flow through self-join exchanges
    val q21 = plan("q21_waiting_supplier")
    assert(q21.contains("partial_min") && !q21.contains("LeftSemi") &&
      !q21.contains("LeftAnti"), q21.take(2000))
    assert(!q21.contains("BroadcastNestedLoopJoin") && !q21.contains("CartesianProduct"))
    val q22 = plan("q22_global_sales")
    assert(q22.contains("LeftAnti"), q22.take(2000))
    // ordered LIMITs distribute (no global sort feeding a limit)
    assert(plan("q10_returned_items").contains("TakeOrderedAndProject"))
    assert(plan("q18_large_volume").contains("TakeOrderedAndProject"))
    // q15's scalar-subquery max broadcasts one row, never sorts globally
    val q15 = plan("q15_top_supplier")
    assert(q15.contains("BroadcastHashJoin") && !q15.contains("GlobalLimit"), q15.take(2000))
  }

  test("trailing window partitions by key; standardize broadcasts one-row stats") {
    val wt = plan("window_trailing_range")
    // the RANGE frame must ride a key-partitioned window (the global
    // no-unpartitioned-window guard below also covers this; here we
    // additionally pin the frame kind and that both aggregates share ONE
    // Window operator (one sort pass)
    assert(wt.contains("RangeFrame") && wt.contains("hashpartitioning(user_id"), wt.take(2000))
    assert("\\+- Window ".r.findAllIn(wt).size == 1, wt.take(2000))
    val st = plan("embedding_standardize")
    // per-dim stats come back as a one-row broadcast, not a join shuffle
    assert(st.contains("BroadcastNestedLoopJoin") || st.contains("BroadcastExchange"), st.take(2000))
    assert(!st.contains("SortMergeJoin"), st.take(2000))
  }

  test("no gated query plans an unpartitioned ordered window (scale-killer guard)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val exempt = Set(
      "metric_gauc_consecutive", // documented bench-compat mode: reference-exact
                                 // consecutive-run semantics genuinely need a total order
      "scan_orc_roundtrip", "stream_dedup_ids") // side-effecting builders (write temp
                                                // files / run a stream); plan no windows
    SparkEntry.queries.keys.filterNot(exempt).toSeq.sorted.foreach { name =>
      val lp = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      val bad = lp.collect { case w: LWindow if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty => w }
      assert(bad.isEmpty, s"$name plans an unpartitioned ordered window — single-partition at scale")
    }
  }
}
