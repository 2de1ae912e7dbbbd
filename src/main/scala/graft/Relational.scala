package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H-shaped relational suite over the reduced star schema.
  *
  * The reference's query surface is the full relational algebra its
  * users reach through the hosting engine (SURVEY §2.6–§2.10): beyond
  * the q1/q3/q5/q6/q14 gates, production pipelines lean on semi/anti
  * joins (EXISTS / NOT EXISTS), correlated scalar subqueries, outer
  * joins feeding aggregation, and disjunctive pushdown. Each query here
  * gates one of those plan shapes against the DuckDB oracle, adapted to
  * the driver schema (no partsupp, no commit/receipt dates — q2, q9's
  * supplycost, q11, q16, q20 are unexpressible and the date-lag
  * predicates are re-cut on the columns that exist).
  *
  * Numeric discipline matches SparkEntry: money accumulates EXACTLY —
  * integer cents ([[cents]], the q1_pricing_summary_cents fast path) on
  * the hot fact sums, DECIMAL(12,2) on the small dimensions — and is
  * cast to DOUBLE only in the final projection with the same expression
  * shape as the oracle's decimal→double cast, so both engines agree
  * bitwise. Every limit is tie-broken on a key column.
  *
  * Scale notes (100 TB): every join below is either a broadcast of a
  * true dimension (nation/region/part/supplier at their TPC-H
  * proportions) or an equi-shuffle on the fact key; the fact⋈orders
  * exchanges carry a `shuffle_hash` hint — the build side is the
  * boundedly-proportioned orders slice (≤ |orders|/partitions rows per
  * task), so the hash build skips SMJ's per-partition O(n log n) fact
  * sort while AQE skew handling still applies. Semi/anti variants keep
  * the build side to the filtered probe list. No query materializes an
  * unbounded intermediate: the correlated-avg in q17 is a pre-aggregated
  * per-key join, q13's outer join aggregates before the distribution
  * count, the q18 HAVING sum IS the output sum (one fact pass), q21's
  * EXISTS pair decorrelates to per-order min/max aggregates, and the
  * q15/q22 scalar subqueries broadcast one row.
  */
object Relational {

  private val D12 = DecimalType(12, 2)
  private def dec(c: String): Column = col(c).cast(D12)
  /** 2-dp money as exact integer cents — the q1_pricing_summary_cents
    * accumulation discipline: primitive-long partial aggregation in
    * codegen (~2.5× the boxed Decimal path on wide scans) with the SAME
    * bit-exact result as the DECIMAL oracle (both are exact integer
    * arithmetic; the one double division at the end mirrors the oracle's
    * decimal→double cast). Overflow envelope as documented on q1_cents:
    * Σ price_cents·(100−disc_cents) stays under 2^63 to ~9×10⁹ max-price
    * rows per group; ANSI mode throws beyond it rather than wrapping. */
  private def cents(c: String): Column = round(col(c) * 100).cast("long")
  /** Σ extendedprice·(1−discount) in 1e-4 dollar units. */
  private def revCentsE4: Column =
    sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
  private def revenueSum: Column = revCentsE4.cast(DoubleType) / 10000.0
  private def ts(s: String): Column = lit(s).cast(TimestampType)

  /** Shared oracle fragment for sum(extendedprice * (1 - discount)). */
  private val revSql =
    """SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2))))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_order_priority" -> { (s, d) =>
      // Q4 shape: EXISTS → left-semi join, then priority histogram. The
      // probe side is pre-filtered to returned lines so the semi join's
      // build never exceeds the returned-line key set.
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-07-01"))
      val ret = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      o.join(ret.hint("shuffle_hash"), o("o_orderkey") === ret("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    "q7_volume_shipping" -> { (s, d) =>
      // Q7 shape: two aliased copies of the same dimension (supplier
      // nation x customer nation) + disjunctive pair predicate + yearly
      // rollup. Both nation copies broadcast.
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .join(Tables.orders(s, d).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(revenueSum.as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    "q8_market_share" -> { (s, d) =>
      // Q8 shape: 7-relation join + share-of-total conditional agg.
      // Round-7 restructure (bit-identical output): the textbook order
      // carried line-grained rows through the custkey and suppkey joins
      // after the orderkey exchange. Now every dim prunes or decorates
      // WITHOUT touching a fact exchange — promo parts and the
      // supplier→is-NATION_8 flag broadcast onto the lines, and the
      // ASIA membership moves to the ORDERS side as a broadcast-semi
      // chain (region→nation keys → customer keys → orders), so the
      // one remaining shuffle pairs the promo lines against a 5×
      // smaller, 2-column orders slice. (A further bloom semi-reduction
      // of the lines by those order keys was A/B'd and rejected — same
      // verdict as q5/q10: no downstream reducing aggregate to pay for
      // the build.)
      val rKeys = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"), "left_semi")
        .select(col("n_nationkey"))
      val asiaCust = Tables.customer(s, d)
        .join(broadcast(rKeys), col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("c_custkey"))
      val asiaOrders = Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderdate"))
      val p = Tables.part(s, d).filter(col("p_type") === "PROMO")
      val suppN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), (col("n_name") === "NATION_8").as("is_n8"))
      val revE4 = cents("l_extendedprice") * (lit(100L) - cents("l_discount"))
      val lp = Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      lp.join(asiaOrders.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        // the /10000.0 on BOTH sums mirrors the oracle's decimal→double
        // casts exactly (cancelling the factors would round differently)
        .agg(((sum(when(col("is_n8"), revE4).otherwise(lit(0L)))
            .cast(DoubleType) / 10000.0)
          / (sum(revE4).cast(DoubleType) / 10000.0)).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    "q9_nation_margin" -> { (s, d) =>
      // Q9 shape (adapted: retailprice stands in for ps_supplycost —
      // no partsupp table): per-nation, per-year margin with a mixed
      // +/− DECIMAL amount that must accumulate exactly.
      val p = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
      val amountE4 = cents("l_extendedprice") * (lit(100L) - cents("l_discount")) -
        cents("p_retailprice") * cents("l_quantity")
      Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(amountE4).cast(DoubleType) / 10000.0).as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    },
    "q10_returned_items" -> { (s, d) =>
      // Q10 shape: returned-revenue top-k per customer (4-way join +
      // agg + TakeOrdered). A round-7 bloom semi-reduction of the
      // R-line scan by the 3-month order keys was A/B'd and REJECTED
      // (2.95 s → 4.17 s at x200): unlike q3, the pruned fact feeds no
      // heavy reducing aggregate — the orders join is already the
      // reducer — so the bloom's build + the subquery gating both scan
      // stages serially (and constraint propagation re-probing it on
      // the orders side) cost more than the saved exchange. Exactly the
      // BloomReduce-scaladoc lesson, now with a second data point.
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-04-01"))
          .hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revenueSum.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    "q12_priority_class" -> { (s, d) =>
      // Q12 shape (adapted: linestatus stands in for shipmode): CASE
      // counting of priority classes per line status.
      val high = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .join(Tables.orders(s, d).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },
    "q13_customer_distribution" -> { (s, d) =>
      // Q13 shape: LEFT OUTER join with an extra join-condition filter
      // (not a WHERE — NULL-extended rows must survive), per-customer
      // count, then the distribution of counts.
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o.hint("shuffle_hash"), c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    "q15_top_supplier" -> { (s, d) =>
      // Q15 shape: aggregate view + scalar-subquery max. The max is a
      // one-row broadcast cross-join, never a global sort.
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(revenueSum.as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    "q17_small_quantity" -> { (s, d) =>
      // Q17 shape: correlated scalar subquery (per-part 0.2×avg
      // threshold) decorrelated into a pre-aggregated equi-join. The
      // avg divides an exact DECIMAL sum by the count in DOUBLE, so
      // the threshold is bit-identical on both engines.
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_brand") === "Brand#23")
      val perPart = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg((sum(cents("l_quantity")).cast(DoubleType) / 100.0 / count(lit(1)))
          .as("avg_qty"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(cents("l_extendedprice")).cast(DoubleType) / 100.0 / 7.0)
          .as("avg_yearly"))
    },
    "q18_large_volume" -> { (s, d) =>
      // Q18 shape: HAVING on a grouped fact. The textbook form re-scans
      // lineitem through an IN-subquery semi join and re-aggregates the
      // detail; since the outer GROUP BY key set is functionally
      // determined by the order key, the per-order sum computed for the
      // HAVING IS the final sum_qty — one lineitem aggregation total,
      // and the surviving handful of big orders joins orders/customer
      // as a broadcast. Identical output, half the fact passes.
      val li = Tables.lineitem(s, d)
      // spread per-order key: shuffle raw rows before aggregating
      // (Aggregates scaladoc — partial agg can't reduce this layout).
      // No explicit narrow select: Catalyst prunes to the two columns
      // anyway, and a hand projection would BLOCK RewriteStoredCents
      // from serving the stored l_quantity_cents on derived layouts
      // (the rule only rewrites where the stored column stays in scope)
      val big = graft.operators.Aggregates
        .byShuffledKey(li, col("l_orderkey"), col("l_orderkey").as("b_orderkey"))
        .agg(sum(cents("l_quantity")).as("b_qty_cents"))
        .filter(col("b_qty_cents") > 300L * 100)
      val o = Tables.orders(s, d)
      big.join(o, col("b_orderkey") === o("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          (col("b_qty_cents").cast(DoubleType) / 100.0).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    "q19_discounted_revenue" -> { (s, d) =>
      // Q19 shape: disjunction of conjunctive ranges across the join —
      // Catalyst must still push the partkey equi-key and the common
      // quantity bound to the scan.
      val p = Tables.part(s, d)
      val li = Tables.lineitem(s, d)
      val branch = (brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand && col("p_size").between(szLo, szHi) &&
          col("l_quantity").between(qLo, qHi)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(branch("Brand#11", 1, 15, 1, 11) ||
          branch("Brand#22", 1, 25, 10, 20) ||
          branch("Brand#33", 1, 35, 20, 30))
        .agg(revenueSum.as("revenue"))
    },
    "q21_waiting_supplier" -> { (s, d) =>
      // Q21 shape (adapted: returnflag='R' stands in for the
      // receipt>commit lateness predicate): EXISTS another supplier in
      // the order AND NOT EXISTS another late supplier. The textbook
      // form is two self-joins of the fact (semi + anti, order key with
      // a <> residual); both EXISTS conditions are per-order facts, so
      // they reduce to plain min/max aggregates instead — "another
      // supplier exists" ⟺ min(supp) ≠ max(supp), "exactly one late
      // supplier" ⟺ min(late supp) = max(late supp), and every late line
      // then belongs to that one supplier. One aggregation pass of the
      // fact (shuffle-first, see below) replaces ~3× the fact through
      // semi/anti exchanges with sorts; identical output.
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_returnflag") === "R").as("r"))
      val lateS = when(col("r"), col("l_suppkey"))
      // 29M order groups spread across the layout: partial aggregation
      // reduces ~nothing, so shuffle raw rows first (Aggregates scaladoc;
      // measured 10.9 -> 6.2 s for this aggregate alone at x200)
      val per = graft.operators.Aggregates
        .byShuffledKey(li, col("l_orderkey"), col("l_orderkey").as("g_ok"))
        .agg(min(col("l_suppkey")).as("minS"), max(col("l_suppkey")).as("maxS"),
          min(lateS).as("minRS"), max(lateS).as("maxRS"),
          sum(when(col("r"), 1L).otherwise(0L)).as("nR"))
        .filter(col("minS") =!= col("maxS") &&
          col("minRS").isNotNull && col("minRS") === col("maxRS"))
      val n = Tables.nation(s, d).filter(col("n_name") === "NATION_3")
      // join the most selective reduction FIRST: supplier⋈nation is a
      // 1/25-nation broadcast, shrinking the per-order frame ~25× before
      // orders ever enters — the F-status orders then hash-join against
      // the small surviving side instead of the full per-order frame
      val suppN = Tables.supplier(s, d)
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("sn_suppkey"), col("s_name"))
      val perN = per.join(broadcast(suppN), col("minRS") === col("sn_suppkey"))
      val oF = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      perN.hint("shuffle_hash").join(oF, col("g_ok") === col("o_orderkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("nR")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    "q22_global_sales" -> { (s, d) =>
      // Q22 shape (adapted: c_name digits stand in for the phone
      // country code, and "no URGENT order" for "no order" — the driver
      // data gives every customer at least one order): scalar-subquery
      // threshold (broadcast one row) + NOT EXISTS anti join, rolled up
      // by code.
      val codes = Seq("00", "11", "22", "33", "44")
      val cust = Tables.customer(s, d)
        .withColumn("cntrycode", substring(col("c_name"), 17, 2))
        .filter(col("cntrycode").isin(codes: _*))
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast(D12)).cast(DoubleType) / count(lit(1))).as("avg_bal"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      cust.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(D12)).cast(DoubleType).as("totacctbal"))
        .orderBy(col("cntrycode"))
    },
  )

  def oracleSql: Map[String, String] = Map(
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST($revSql AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_8'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |         * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |  AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_nation_margin" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))
        |    AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_type = 'ECONOMY'
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST($revSql AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q12_priority_class" ->
      // CASTs on the SUMs: avoid DuckDB HUGEINT, which the driver's
      // pandas bridge degrades to float64 and hash-diverges from int64
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey, CAST($revSql AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,
    "q17_small_quantity" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT l_partkey AS t_partkey,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) t ON l_partkey = t_partkey
        |WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty""".stripMargin,
    "q18_large_volume" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_discounted_revenue" ->
      s"""SELECT CAST($revSql AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F' AND n_name = 'NATION_3'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |              WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q22_global_sales" ->
      """WITH cust AS (
        |  SELECT substring(c_name, 17, 2) AS cntrycode, c_custkey, c_acctbal
        |  FROM customer
        |  WHERE substring(c_name, 17, 2) IN ('00', '11', '22', '33', '44'))
        |SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM cust
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |    FROM cust WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
  )
}
