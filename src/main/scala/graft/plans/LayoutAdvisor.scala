package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Write-time layout selection for a query corpus.
  *
  * Round-8 proved the durable answer to exchange-bound per-key work is
  * bucketing the table on that key at WRITE time (PERF.md: q18 2×
  * faster than DuckDB, q21/q5/q9/q12 all 1.6–3× off their exchange
  * plans) — but applying it meant hand-picking table, key, buckets and
  * the carried column set per query class. This advisor derives those
  * choices FROM the queries themselves:
  *
  *  - walks each query's optimized logical plan (so Catalyst's column
  *    pruning has already happened) and maps every per-key operator —
  *    grouping keys of an [[Aggregate]], both sides of an equi-[[Join]]
  *    — back to the parquet leaf it reads, by attribute id;
  *  - counts hits per (table, key): a key that carries three queries'
  *    aggregates outranks one that carries one join side;
  *  - unions the PRUNED column sets of the hitting queries — the r8
  *    finding "carry only the columns the query class needs" (2.91 vs
  *    1.88 s at x200) becomes enforced: [[stage]] writes exactly these
  *    columns, so a query reading anything else fails loudly instead
  *    of silently paying full width;
  *  - sizes buckets from the relation's on-disk bytes (one bucket ≈
  *    `targetBucketBytes`), the same sizing rule you'd apply per
  *    executor-core at cluster scale.
  *
  * Staging goes through
  * [[graft.sources.TabularWriter.toBucketedTable]] with sorted=true —
  * one sorted file per bucket — so every advised layout also gets the
  * streaming SortAggregate plan (zero exchange, zero sort, O(1) group
  * state; PlanShapeSpec) rather than a groups-sized hash table.
  *
  * Reference analog: the id-partitioned embedding shard layout the
  * reference derives from its lookup keys (embedding/sharding.py:
  * 168-205) — here generalized to any per-key query class and made a
  * one-call product API instead of hand-staging.
  */
object LayoutAdvisor {

  /** One recommended bucketed projection: stage `columns` of the table
    * at `path` bucketed+sorted on `key` into `buckets` files. `hits` =
    * how many per-key operators across the corpus this layout carries
    * (the advisor's ranking signal, kept for reporting). */
  case class LayoutSpec(path: String, table: String, key: String,
      buckets: Int, columns: Seq[String], hits: Int)

  /** One bucket per ~`target` bytes of source data, floored at 8 so
    * small inputs still exercise the layout, capped at 4096 (a 100 TB
    * table at the 1 GiB default = 4096 buckets ≈ 25 GB each — size
    * `target` down if a single bucket must fit one task's memory). */
  def bucketsFor(bytes: Long, target: Long): Int =
    math.min(4096L, math.max(8L, (bytes + target - 1) / target)).toInt

  private def tableName(path: String): String = {
    val base = path.stripSuffix("/").split('/').last
    base.stripSuffix(".parquet").stripSuffix(".orc")
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Analyze a corpus and recommend one bucketed layout per table that
    * any per-key operator reads, ranked by hits (ties broken by table
    * name for determinism). Tables whose best key carries fewer than
    * `minHits` operators are dropped — a one-off key does not pay for
    * a write-time shuffle of the whole table.
    *
    * Join alignment: a co-located join only stays exchange-free when
    * BOTH sides share the bucket count, so tables whose chosen keys
    * meet in an equi-join are placed in one alignment class and all
    * get the class MAXIMUM of their size-derived counts (the bigger
    * table's count; re-bucketing the smaller side is cheap relative to
    * shuffling the big one per query). Without this, lineitem at 4× the
    * bytes of orders would get 4× the buckets and the order-key join
    * would silently re-shuffle one side at every query. */
  def advise(corpus: Seq[DataFrame], targetBucketBytes: Long = 1L << 30,
      minHits: Int = 1): Seq[LayoutSpec] = {
    require(corpus.nonEmpty, "LayoutAdvisor.advise: empty corpus")
    // (path, keyColumn) -> hit count; path -> (bytes, union of pruned columns)
    val hits = scala.collection.mutable.Map.empty[(String, String), Int]
    val tables = scala.collection.mutable.Map.empty[String, (Long, Set[String])]
    // equi-join edges between (path, column) pairs, for bucket alignment
    val joinEdges = scala.collection.mutable.Set.empty[((String, String), (String, String))]
    corpus.foreach { df =>
      val plan = df.queryExecution.optimizedPlan
      // attributes referenced by ANY operator in the plan — the v1
      // leaf keeps its full-width output in the logical plan (column
      // pruning lands in the Project above / the physical ReadSchema),
      // so "what this query reads" is leaf output ∩ plan references
      // (leaves excluded: a LogicalRelation's own output attributes
      // count as its expressions and would mark every column used)
      val refIds = plan.collect {
        case n if n.children.nonEmpty => n.expressions.flatMap(_.references.toSeq)
      }.flatten.map(_.exprId.id).toSet
      // leaf attribute id -> (path, column name)
      val byId = scala.collection.mutable.Map.empty[Long, (String, String)]
      plan.foreach {
        case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val fs = lr.relation.asInstanceOf[HadoopFsRelation]
          val path = fs.location.rootPaths.head.toString
          lr.output.foreach(a => byId(a.exprId.id) = (path, a.name))
          val used = lr.output.filter(a => refIds(a.exprId.id))
          // a bare scan references nothing above the leaf: full width
          val cols = if (used.isEmpty) lr.output else used
          val (bytes, prev) = tables.getOrElse(path, (fs.sizeInBytes, Set.empty[String]))
          tables(path) = (bytes, prev ++ cols.map(_.name))
        case _ =>
      }
      def hit(a: Attribute): Unit =
        byId.get(a.exprId.id).foreach { pc => hits(pc) = hits.getOrElse(pc, 0) + 1 }
      plan.foreach {
        case agg: Aggregate =>
          agg.groupingExpressions.foreach {
            case ar: AttributeReference => hit(ar)
            case _ =>
          }
        case j: Join =>
          j.condition.toSeq.flatMap(conjuncts).foreach {
            case EqualTo(l: AttributeReference, r: AttributeReference) =>
              hit(l); hit(r)
              for (lp <- byId.get(l.exprId.id); rp <- byId.get(r.exprId.id))
                if (lp != rp) joinEdges += (if (lp.toString < rp.toString) (lp, rp) else (rp, lp))
            case _ =>
          }
        case _ =>
      }
    }
    // per-table key choice: most hits wins; ties prefer a key that
    // participates in an equi-join (co-location pays on the join AND
    // every downstream per-key agg, where a tied agg-only key pays
    // once), then name for determinism
    val joinKeyset: Set[(String, String)] =
      joinEdges.flatMap(e => Seq(e._1, e._2)).toSet
    val chosen = hits.groupBy(_._1._1).toSeq.flatMap { case (path, keyed) =>
      val ((_, key), n) = keyed.maxBy { case ((p, k), c) => (c, joinKeyset((p, k)), k) }
      if (n < minHits) None else Some((path, key, n))
    }
    // alignment classes: union-find over join edges between CHOSEN
    // (path, key) pairs; every class member gets the class max buckets
    val parent = scala.collection.mutable.Map.empty[(String, String), (String, String)]
    def find(x: (String, String)): (String, String) = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val chosenSet = chosen.map(c => (c._1, c._2)).toSet
    joinEdges.foreach { case (a, b) =>
      if (chosenSet(a) && chosenSet(b)) parent(find(a)) = find(b)
    }
    val ownBuckets = chosen.map { case (path, key, _) =>
      (path, key) -> bucketsFor(tables(path)._1, targetBucketBytes)
    }.toMap
    val classMax = ownBuckets.keys.groupBy(find).map { case (root, members) =>
      root -> members.map(ownBuckets).max
    }
    chosen.map { case (path, key, n) =>
      val (_, cols) = tables(path)
      LayoutSpec(path, tableName(path), key,
        classMax(find((path, key))),
        // key first, then the rest of the observed pruned union in
        // stable order
        (key +: cols.toSeq.filter(_ != key).sorted).distinct, n)
    }.sortBy(s => (-s.hits, s.table))
  }

  /** Multi-projection advice: up to `perTable` bucketed projections
    * PER TABLE, one per hot key (the column-store projection idea —
    * a fact table queried by order key AND by customer key carries
    * one sorted co-located projection per class; ProbeCustLayout
    * measured the custkey class at 2× beside the orderkey class's
    * wins). Differences from [[advise]], deliberately:
    *
    *  - columns are attributed PER KEY — a projection carries the
    *    pruned union of the queries that hit ITS key, not everything
    *    the table serves (secondary projections exist precisely to
    *    serve their own class narrowly; advise()'s table-wide union
    *    stays the right contract when one staged table must replace
    *    the flat read for every query);
    *  - a table can appear in several alignment classes — each
    *    projection aligns its bucket count within its own join class.
    */
  def adviseProjections(corpus: Seq[DataFrame], perTable: Int,
      targetBucketBytes: Long = 1L << 30, minHits: Int = 1): Seq[LayoutSpec] = {
    require(perTable > 0, s"adviseProjections: perTable must be positive, got $perTable")
    val hitAgg = scala.collection.mutable.Map.empty[(String, String), (Int, Set[String])]
    val bytesOf = scala.collection.mutable.Map.empty[String, Long]
    val joinEdges = scala.collection.mutable.Set.empty[((String, String), (String, String))]
    corpus.foreach { df =>
      val plan = df.queryExecution.optimizedPlan
      val refIds = plan.collect {
        case n if n.children.nonEmpty => n.expressions.flatMap(_.references.toSeq)
      }.flatten.map(_.exprId.id).toSet
      val byId = scala.collection.mutable.Map.empty[Long, (String, String)]
      val usedByPath = scala.collection.mutable.Map.empty[String, Set[String]]
      plan.foreach {
        case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val fs = lr.relation.asInstanceOf[HadoopFsRelation]
          val path = fs.location.rootPaths.head.toString
          lr.output.foreach(a => byId(a.exprId.id) = (path, a.name))
          val used = lr.output.filter(a => refIds(a.exprId.id))
          usedByPath(path) = usedByPath.getOrElse(path, Set.empty) ++
            (if (used.isEmpty) lr.output else used).map(_.name)
          bytesOf.getOrElseUpdate(path, fs.sizeInBytes)
        case _ =>
      }
      def hit(a: Attribute): Unit = byId.get(a.exprId.id).foreach { case pc @ (p, _) =>
        val (c, cols) = hitAgg.getOrElse(pc, (0, Set.empty[String]))
        hitAgg(pc) = (c + 1, cols ++ usedByPath.getOrElse(p, Set.empty))
      }
      plan.foreach {
        case agg: Aggregate => agg.groupingExpressions.foreach {
          case ar: AttributeReference => hit(ar)
          case _ =>
        }
        case j: Join => j.condition.toSeq.flatMap(conjuncts).foreach {
          case EqualTo(l: AttributeReference, r: AttributeReference) =>
            hit(l); hit(r)
            for (lp <- byId.get(l.exprId.id); rp <- byId.get(r.exprId.id))
              if (lp != rp) joinEdges += (if (lp.toString < rp.toString) (lp, rp) else (rp, lp))
          case _ =>
        }
        case _ =>
      }
    }
    val joinKeyset: Set[(String, String)] = joinEdges.flatMap(e => Seq(e._1, e._2)).toSet
    val chosen = hitAgg.groupBy(_._1._1).toSeq.flatMap { case (_, keyed) =>
      keyed.toSeq
        .sortBy { case ((p, k), (c, _)) => (-c, !joinKeyset((p, k)), k) }
        .take(perTable)
        .filter { case (_, (c, _)) => c >= minHits }
    }
    val parent = scala.collection.mutable.Map.empty[(String, String), (String, String)]
    def find(x: (String, String)): (String, String) = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val chosenSet = chosen.map(_._1).toSet
    joinEdges.foreach { case (a, b) =>
      if (chosenSet(a) && chosenSet(b)) parent(find(a)) = find(b)
    }
    val own = chosen.map { case (pc @ (p, _), _) =>
      pc -> bucketsFor(bytesOf(p), targetBucketBytes)
    }.toMap
    val classMax = own.keys.groupBy(find).map { case (root, ms) => root -> ms.map(own).max }
    chosen.map { case ((p, k), (c, cols)) =>
      LayoutSpec(p, tableName(p), k, classMax(find((p, k))),
        (k +: cols.toSeq.filter(_ != k).sorted).distinct, c)
    }.sortBy(s => (-s.hits, s.table, s.key))
  }

  /** Stage one advised layout as catalog table `name` (parquet read of
    * spec.path → exactly spec.columns → bucketed+sorted on spec.key).
    * The write is the only shuffle this table's per-key query class
    * ever pays. */
  def stage(spark: SparkSession, spec: LayoutSpec, name: String): Unit = {
    import org.apache.spark.sql.functions.col
    graft.sources.TabularWriter.toBucketedTable(
      spark.read.parquet(spec.path).select(spec.columns.map(col): _*),
      name, spec.key, spec.buckets, sorted = true)
  }
}
