package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** MATERIALIZED JOIN PROJECTIONS — the pre-joined (denormalized) star
  * as a staged layout, served by an exact optimizer rewrite.
  *
  * The round-11 routed sweep's residual is one shape: fact⋈dim joins
  * whose non-broadcast side re-keys 30–120M rows per query (q3/q4/q5/
  * q8/q9/q10/q21 all pay the orders-side exchange; PERF.md). Bucketing
  * co-locates ONE key; a pre-joined projection removes the join
  * entirely — the write is the join, paid once. Because parquet is
  * columnar, a query over the wide table reads exactly the columns it
  * would have read from the base tables, minus both join keys' shuffle.
  *
  * Reference analog: the reference's own pipeline PRE-JOINS user
  * behavior onto samples at prep time (docs/tutorial/ranking/taobao/
  * data/prep_3_merge.py:41-48 — left join + fill, materialized before
  * training ever runs); here the same move is product: advise from the
  * corpus ([[LayoutAdvisor.adviseDenormalized]]), stage audited
  * ([[MaterializedJoins.stageDenorm]]), rewrite exactly
  * ([[RewriteMaterializedJoin]]).
  *
  * EXACTNESS CONTRACT. A registered table `D = fact ⋈ d1 ⋈ … ⋈ dn`
  * (inner equi-joins on recorded keys) replaces a query's inner-join
  * subtree when:
  *  - the subtree (flattened through inner joins, pure-column Projects
  *    and interleaved Filters — all equivalent to one big
  *    filter-over-cross-product for INNER joins) contains the fact leaf
  *    exactly once, reading the exact base path;
  *  - a subset S of D's dims is present, each connected to its recorded
  *    parent by exactly the recorded key equality (extra predicates
  *    between members are kept as filters over D — they commute);
  *  - every dim in D∖S is LOSSLESS — stage-time-audited unique key +
  *    total foreign key ([[MaterializedJoins.stageDenorm]]) — so
  *    joining it neither drops nor duplicates rows: D projected onto
  *    the S-columns IS fact⋈S, row for row;
  *  - every column the replaced leaves expose to the rest of the plan
  *    is carried by D.
  * The replacement subtree aliases D's columns back to the ORIGINAL
  * exprIds, so nothing above the join changes; leaf filters and
  * non-absorbed conjuncts are re-applied above the scan (pushdown
  * re-sinks them), and the remaining inputs re-join on their original
  * conditions. Any unplaceable condition or would-be cross join
  * declines the whole rewrite — the rule returns the plan untouched
  * rather than approximate.
  *
  * STORED CENTS THROUGH THE REWRITE. [[RewriteStoredCents]] runs at
  * post-hoc resolution and only sees base scans, so a denorm staged
  * with `<col>_cents` longs would never serve the money idioms above a
  * rewritten join. This rule therefore carries the stored cents
  * attributes through its alias projection and runs the same
  * shared-matcher idiom rewrite over the ancestors (scope-validated,
  * with a no-cents fallback) — one staged table serves both the join
  * removal and the decode removal.
  *
  * Scale: at 1000 executors the removed exchange is the win that
  * compounds — the fact table never crosses the network for the
  * covered join classes, and the denorm's bucket key keeps the
  * residual per-key aggregate co-located. The redundancy cost is
  * disk (dim columns repeat per fact row — RLE/dictionary encoding
  * absorbs most of it), paid once at stage time.
  */
object MaterializedJoins {

  /** One dim of a staged denorm: joined to `parentTable` (the fact or
    * an earlier dim) on `parentKey = dimKey`. `lossless` = stage-time
    * audit proved dimKey unique in the dim AND every parentKey value
    * present (see [[stageDenorm]]) — the precondition for serving
    * queries that do NOT join this dim. */
  case class DimMeta(table: String, path: String, parentTable: String,
      parentKey: String, dimKey: String, lossless: Boolean)

  /** A registered materialized join the rewrite may serve. `columns` =
    * lowercase base columns carried; `cents` = lowercase source columns
    * with a stored `<col>_cents` sibling; `finite` = the subset of
    * `cents` whose stage-time finiteness audit passed (the DECIMAL
    * idiom's precondition — [[RewriteStoredCents.FiniteProperty]]). */
  /** `fingerprints` = member path → [[Freshness]] fingerprint of that
    * base table AT STAGE TIME. The rewrite re-checks the members present
    * in each query against the live FileIndex and declines on drift;
    * [[attachDenorm]] checks ALL members (including dims the queries
    * omit — their lossless audits rot with the data). Empty map =
    * unrecorded (hand-built test metas) — unchecked by contract. */
  case class Meta(catalogTable: String, fact: String, factPath: String,
      dims: Seq[DimMeta], columns: Set[String], cents: Set[String],
      finite: Set[String], fingerprints: Map[String, String] = Map.empty)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Meta]()

  def register(meta: Meta): Unit = registry.put(meta.catalogTable, meta)
  def deregister(catalogTable: String): Unit = registry.remove(catalogTable)
  def clear(): Unit = registry.clear()
  def all: Seq[Meta] =
    registry.values.toArray(Array.empty[Meta]).toSeq.sortBy(_.catalogTable)

  /** Scoped registration for gate closures: register, build (and
    * FORCE-OPTIMIZE — the plan must be rewritten while the metas are
    * live; QueryExecution caches the optimized plan, so later execution
    * keeps the rewrite), deregister. Gates run inside multi-query mains
    * (Verify, Bench) where a process-wide registration would silently
    * rewrite every OTHER query over the same base paths. */
  def withRegistered(metas: Seq[Meta])(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    metas.foreach(register)
    try {
      val df = build
      df.queryExecution.optimizedPlan // force while registered
      df
    } finally metas.foreach(m => deregister(m.catalogTable))
  }

  /** The (comma-joined) root path of `df`'s single file scan — the
    * identity [[Meta.factPath]]/[[DimMeta.path]] match against. */
  def leafPath(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.map(_.toString).mkString(",")
    }.getOrElse(sys.error("MaterializedJoins.leafPath: no file scan in plan"))

  /** True iff `df`'s optimized plan reads the materialized table —
    * the "did the rewrite fire" probe gates and specs pin on. */
  def fired(df: org.apache.spark.sql.DataFrame, catalogTable: String): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation
          if lr.catalogTable.exists(_.identifier.table == catalogTable) => lr
    }.nonEmpty

  private val Flag = "spark.graft.materializedJoin.enabled"
  private[plans] def enabled(conf: org.apache.spark.sql.internal.SQLConf): Boolean =
    conf.getConfString(Flag, "true") == "true"

  /** Conf for the `dim ⋉ fact` SEMI-SUBSUMPTION arm — default OFF.
    * Measured at x200 (binding protocol, round 11): the subsumed q4
    * plan is the ideal shape (one bucketed scan, zero joins,
    * exchange-free dedup aggregate) yet runs 3.7 s vs ~3.3 s for the
    * routed co-located pair and ~3.6 s flat — the dim's columns decode
    * at FACT grain (120M o_orderpriority strings instead of 30M), and
    * that buys back everything the removed exchange saved. The arm
    * stays correct and tested; enable it per session on topologies
    * where the probe-side exchange dominates decode (wide clusters,
    * remote storage), the same measured-decline discipline as
    * routeAll's tiering. */
  private[plans] val SemiFlag = "spark.graft.materializedJoin.subsumeSemi"
  private[plans] def semiEnabled(conf: org.apache.spark.sql.internal.SQLConf): Boolean =
    conf.getConfString(SemiFlag, "false") == "true"

  /** Sidecar written beside a staged denorm's files: everything a fresh
    * JVM needs to re-[[attachDenorm]] and re-[[register]] without
    * re-running the join or the audits. */
  val DenormSidecar = "_graft_denorm"

  private def sidecarBody(spec: LayoutAdvisor.DenormSpec, dims: Seq[DimMeta],
      columns: Seq[String], cents: Seq[String], finite: Seq[String],
      fingerprints: Map[String, String]): String = {
    val dimLines = dims.map(d =>
      s"dim ${d.table} ${d.path} ${d.parentTable} ${d.parentKey} ${d.dimKey} ${d.lossless}")
    val fpLines = fingerprints.toSeq.sortBy(_._1).map { case (p, h) => s"fp $p $h" }
    (Seq(
      s"fact ${spec.fact} ${spec.factPath}",
      s"bucket ${spec.bucketKey.getOrElse("-")} ${spec.buckets}",
      s"columns ${columns.sorted.mkString(",")}",
      s"cents ${cents.sorted.mkString(",")}",
      s"finite ${finite.sorted.mkString(",")}") ++ dimLines ++ fpLines)
      .mkString("", "\n", "\n")
  }

  private def parseFingerprints(lines: Seq[String]): Map[String, String] =
    lines.filter(_.startsWith("fp ")).map { l =>
      l.stripPrefix("fp ").split("\\s+") match {
        case Array(p, h) => p -> h
        case other => throw new IllegalArgumentException(
          s"malformed fp line '${other.mkString(" ")}'")
      }
    }.toMap

  /** Stage `spec` as bucketed catalog table `name`: run the inner
    * equi-join chain over the base paths, carry exactly the advised
    * columns plus stored `<col>_cents` for the advised money columns
    * (finiteness-audited, same discipline as
    * [[LayoutAdvisor.stageDerived]]), bucket+sort on the advised key,
    * and AUDIT each dim's losslessness:
    *  - unique: max per-key multiplicity of `dimKey` in the dim is 1;
    *  - total: zero parent rows whose `parentKey` misses the dim
    *    (an anti-join count — NULL foreign keys can never match, so
    *    they fail totality and correctly mark the dim lossy).
    * Both audits are one aggregate each over narrow columns. A lossy
    * dim stays usable for queries that join it themselves; only
    * subset rewrites need the proof. Returns the registered [[Meta]].
    *
    * The rewrite rule is DISABLED for the duration of the staging
    * write — the staging query is itself a fact⋈dims join and a
    * previously registered overlapping denorm must not serve it. */
  def stageDenorm(spark: SparkSession, spec: LayoutAdvisor.DenormSpec,
      name: String): Meta = {
    import org.apache.spark.sql.functions.{col, countDistinct, count, lit, max, round}
    val saved = spark.conf.getOption(Flag)
    spark.conf.set(Flag, "false")
    try {
      def read(path: String) = spark.read.parquet(path.split(',').toIndexedSeq: _*)
      val tables: Map[String, org.apache.spark.sql.DataFrame] =
        (Seq(spec.fact -> spec.factPath) ++ spec.dims.map(d => d.table -> d.path))
          .map { case (t, p) => t -> read(p) }.toMap
      // column-name disjointness: the rewrite maps attributes by NAME,
      // so a collision across members would be ambiguous — decline loudly
      val allCols = tables.toSeq.sortBy(_._1).flatMap { case (t, df) =>
        df.columns.map(c => c.toLowerCase -> t)
      }
      val dup = allCols.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
      require(dup.isEmpty, s"stageDenorm($name): column name(s) " +
        s"${dup.keys.toSeq.sorted.mkString(", ")} appear in several member tables")

      // audits per dim (narrow scans, before the wide write)
      val audited = spec.dims.map { d =>
        val dim = tables(d.table)
        val parent = tables(d.parentTable)
        val unique = dim.groupBy(col(d.dimKey)).agg(count(lit(1)).as("n"))
          .agg(max(col("n")).as("m")).collect()(0) match {
          case r if r.isNullAt(0) => true // empty dim is vacuously unique
          case r => r.getLong(0) <= 1L
        }
        val total = parent.select(col(d.parentKey))
          .join(dim.select(col(d.dimKey)),
            col(d.parentKey) === col(d.dimKey), "left_anti")
          .limit(1).count() == 0L
        DimMeta(d.table, d.path, d.parentTable, d.parentKey, d.dimKey,
          lossless = unique && total)
      }

      val joined = spec.dims.foldLeft(tables(spec.fact)) { (acc, d) =>
        acc.join(tables(d.table), col(d.parentKey) === col(d.dimKey), "inner")
      }
      val carried = spec.columns.map(_.toLowerCase)
      val projected = joined.select(carried.map(col): _*)
      // a member table that ALREADY has a literal `<col>_cents` column
      // would be silently overwritten by the derived withColumn below —
      // decline that cents column loudly instead (the stored values
      // must never shadow real data)
      val (collided, cents1) = spec.centsCols.map(_.toLowerCase)
        .filter(carried.contains).partition(c => carried.contains(c + "_cents"))
      if (collided.nonEmpty) System.err.println(s"[advise] stageDenorm($name): " +
        s"declining cents for ${collided.mkString(", ")} — a carried column " +
        "already uses the derived name")
      val cents0 = cents1
      val finite = LayoutAdvisor.auditFinite(projected, cents0)
      if (finite != cents0) System.err.println(s"[advise] stageDenorm($name): " +
        s"declining non-finite money column(s) ${cents0.diff(finite).mkString(", ")}")
      val withCents = finite.foldLeft(projected)((df, c) =>
        df.withColumn(c + "_cents", round(col(c) * 100).cast("long")))
      spec.bucketKey match {
        case Some(k) =>
          graft.sources.TabularWriter.toBucketedTable(
            withCents, name, k, spec.buckets, sorted = true)
        case None => withCents.write.mode("overwrite").saveAsTable(name)
      }
      if (finite.nonEmpty) {
        LayoutAdvisor.markDerived(spark, name, finite)
        LayoutAdvisor.markDerivedFinite(spark, name, finite)
      }
      // freshness: fingerprint every member's base files AS STAGED —
      // the audits and the join itself are only valid for these bytes
      val fps = (Seq(spec.factPath) ++ spec.dims.map(_.path)).distinct
        .map(p => p -> Freshness.ofPath(spark, p)).toMap
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name)).location
      java.nio.file.Files.write(
        java.nio.file.Paths.get(loc.getPath, DenormSidecar),
        sidecarBody(spec, audited, carried, finite, finite, fps).getBytes("UTF-8"))
      val meta = Meta(name, spec.fact, spec.factPath, audited,
        carried.toSet, finite.toSet, finite.toSet, fps)
      register(meta)
      meta
    } finally {
      saved match {
        case Some(v) => spark.conf.set(Flag, v)
        case None => spark.conf.unset(Flag)
      }
    }
  }

  /** Parse a staged denorm's sidecar at `path` into the [[Meta]] it
    * records (no registration, no validation — callers that need the
    * advice-drift guard use [[attachDenorm]]). */
  def metaFromSidecar(catalogTable: String, path: String): Meta = {
    val sidecar = java.nio.file.Paths.get(path, DenormSidecar)
    require(java.nio.file.Files.exists(sidecar),
      s"metaFromSidecar($catalogTable): sidecar $sidecar missing")
    val lines = new String(java.nio.file.Files.readAllBytes(sidecar), "UTF-8")
      .split("\n").toSeq
    def line(prefix: String): String = lines.collectFirst {
      case l if l.startsWith(prefix + " ") => l.stripPrefix(prefix + " ")
    }.getOrElse(throw new IllegalArgumentException(
      s"metaFromSidecar($catalogTable): sidecar missing '$prefix' line"))
    def csv(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val factLine = line("fact").split("\\s+")
    val dims = lines.filter(_.startsWith("dim ")).map { l =>
      l.stripPrefix("dim ").split("\\s+") match {
        case Array(t, p, pt, pk, dk, ll) => DimMeta(t, p, pt, pk, dk, ll.toBoolean)
        case other => throw new IllegalArgumentException(
          s"metaFromSidecar($catalogTable): malformed dim line '${other.mkString(" ")}'")
      }
    }
    Meta(catalogTable, factLine(0), factLine(1), dims,
      csv(line("columns")).toSet, csv(line("cents")).toSet,
      csv(line("finite")).toSet, parseFingerprints(lines))
  }

  /** Fresh-JVM re-attach of already-staged denorm files at `path` as
    * catalog table `name` (the local stand-in for a persistent
    * metastore): the sidecar must prove the files were staged from the
    * SAME spec — fact path, dim chain and bucket key — or we re-stage
    * rather than silently serve a drifted projection. Returns the
    * re-registered [[Meta]]. */
  def attachDenorm(spark: SparkSession, spec: LayoutAdvisor.DenormSpec,
      name: String, path: String): Meta = {
    val sidecar = java.nio.file.Paths.get(path, DenormSidecar)
    require(java.nio.file.Files.exists(sidecar),
      s"attachDenorm($name): sidecar $sidecar missing — re-stage")
    val lines = new String(java.nio.file.Files.readAllBytes(sidecar), "UTF-8")
      .split("\n").toSeq
    def line(prefix: String): String = lines.collectFirst {
      case l if l.startsWith(prefix + " ") => l.stripPrefix(prefix + " ")
    }.getOrElse(throw new IllegalArgumentException(
      s"attachDenorm($name): sidecar missing '$prefix' line — re-stage"))
    def csv(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val factLine = line("fact").split("\\s+")
    val bucketLine = line("bucket").split("\\s+")
    val dims = lines.filter(_.startsWith("dim ")).map { l =>
      l.stripPrefix("dim ").split("\\s+") match {
        case Array(t, p, pt, pk, dk, ll) => DimMeta(t, p, pt, pk, dk, ll.toBoolean)
        case other => throw new IllegalArgumentException(
          s"attachDenorm($name): malformed dim line '${other.mkString(" ")}'")
      }
    }
    require(factLine.length == 2 && factLine(0) == spec.fact &&
      factLine(1) == spec.factPath &&
      bucketLine(0) == spec.bucketKey.getOrElse("-") &&
      dims.map(d => (d.table, d.path, d.parentTable, d.parentKey, d.dimKey)) ==
        spec.dims.map(d => (d.table, d.path, d.parentTable, d.parentKey, d.dimKey)),
      s"attachDenorm($name): sidecar does not match this session's advice — re-stage")
    // FRESHNESS: every member's base files must still be the bytes the
    // layout (and its lossless audits) were staged from — a base table
    // that grew since staging would be silently served pre-append rows.
    // ALL members are checked here (the rewrite can only re-check the
    // ones present in a query; an omitted dim's audit rots invisibly).
    val fps = parseFingerprints(lines)
    (Seq(spec.factPath) ++ spec.dims.map(_.path)).distinct.foreach { p =>
      fps.get(p).foreach { staged =>
        val live = Freshness.ofPath(spark, p)
        require(live == staged,
          s"attachDenorm($name): base data at $p drifted since staging " +
            s"(staged=$staged live=$live) — re-stage")
      }
    }
    spec.bucketKey match {
      case Some(k) =>
        graft.sources.TabularWriter.attach(spark, name, path, k, spec.buckets)
      case None =>
        val schema = spark.read.parquet(path).schema.toDDL
        spark.sql(s"CREATE TABLE `$name` ($schema) USING parquet LOCATION '$path'")
    }
    val finite = csv(line("finite"))
    if (finite.nonEmpty) {
      LayoutAdvisor.markDerived(spark, name, finite)
      LayoutAdvisor.markDerivedFinite(spark, name, finite)
    }
    val meta = Meta(name, spec.fact, spec.factPath, dims,
      csv(line("columns")).toSet, csv(line("cents")).toSet, finite.toSet, fps)
    register(meta)
    meta
  }
}

/** The optimizer rule serving [[MaterializedJoins]] registrations. See
  * the companion's scaladoc for the exactness contract. Injected FIRST
  * among the engine's optimizer rules (before [[EagerAggregation]]) so
  * the join subtree is matched before any other rewrite reshapes it. */
object RewriteMaterializedJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val metas = MaterializedJoins.all
    if (metas.isEmpty || !MaterializedJoins.enabled(conf)) return plan
    val spark = SparkSession.getActiveSession.getOrElse(return plan)
    // original source-attr exprId -> (stored cents attr, finite) across
    // every substitution this pass makes — consumed by the ancestors'
    // money-idiom rewrite below
    val centsMap = scala.collection.mutable.Map.empty[Long, (Attribute, Boolean)]
    var fired = false
    val substituted = plan.transformDown {
      case j @ Join(_, _, Inner, _, _) =>
        tryRewrite(spark, j, metas, centsMap) match {
          case Some(n) => fired = true; n
          case None => j
        }
      case j @ Join(_, _, org.apache.spark.sql.catalyst.plans.LeftSemi, Some(_), _)
          if MaterializedJoins.semiEnabled(conf) =>
        trySemiSubsume(spark, j, metas) match {
          case Some(n) => fired = true; n
          case None => j
        }
    }
    if (!fired) return plan
    rewriteAncestorCents(substituted, centsMap.toMap)
  }

  // ---------------------------------------------------------- matching

  /** Inner-join flattening: the subtree as (inputs, conjuncts), peeling
    * interleaved Filters and pure-column Projects (for INNER joins the
    * whole region is one filter-over-cross-product, so both commute;
    * widening an intermediate Project's output is safe — parents
    * reference by exprId and pruning re-narrows). Stops at anything
    * else: a non-inner join, an aggregate, a leaf. */
  private def hasJoinBelow(p: LogicalPlan): Boolean = p match {
    case Join(_, _, Inner, _, _) => true
    case f: Filter => hasJoinBelow(f.child)
    case pr: Project if pr.projectList.forall(_.isInstanceOf[Attribute]) =>
      hasJoinBelow(pr.child)
    case _ => false
  }

  /** Flattened inputs carry their join-side hint ONLY when the side
    * flattens to that single input — `broadcast(dim)` must survive the
    * rewrite (or the re-joined dim could sort-merge and re-shuffle the
    * very scan the projection was staged to keep exchange-free), but a
    * hint spanning a MULTI-input side described a join the rewrite
    * absorbs and is obsolete: q5's `shuffle_hash` on its
    * orders⋈customer⋈nation side, re-attached to the rebuilt
    * denorm⋈customer join, forced a 120M-row exchange where an
    * unhinted plan broadcasts the customer slice. */
  private def flatten(p: LogicalPlan,
      inherited: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo] = None)
      : (Seq[(LogicalPlan, Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo])],
         Seq[Expression]) =
    p match {
      case Join(l, r, Inner, cond, hint) =>
        def side(child: LogicalPlan,
            h: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo]) = {
          val (ins, cs) = flatten(child, None)
          val hinted = if (ins.size == 1 && h.isDefined)
            Seq((ins.head._1, ins.head._2.orElse(h))) else ins
          (hinted, cs)
        }
        val (li, lc) = side(l, hint.leftHint.orElse(inherited))
        val (ri, rc) = side(r, hint.rightHint.orElse(inherited))
        (li ++ ri, lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
      case f: Filter if hasJoinBelow(f.child) && f.condition.deterministic =>
        // non-deterministic conjuncts (rand(), input_file_name(), …) are
        // NOT absorbed: re-applying them above the denorm scan would
        // re-evaluate them at a different grain / over different files —
        // the same guard Catalyst's own PushPredicateThroughJoin applies.
        // A non-det Filter becomes a region BOUNDARY instead (the
        // subtree below it is simply not servable).
        val (i, c) = flatten(f.child, inherited)
        (i, c ++ splitConjunctivePredicates(f.condition))
      case pr: Project if pr.projectList.forall(_.isInstanceOf[Attribute]) &&
          hasJoinBelow(pr.child) =>
        flatten(pr.child, inherited)
      case other => (Seq((other, inherited)), Nil)
    }

  /** One flattened input, peeled: `path` is defined iff the input is a
    * chain of Filters / pure-column Projects over a single HadoopFs
    * leaf — the shape the rewrite can absorb. `outputs` = what the input exposes to the join
    * region; `filters` = its local predicates (re-applied over the
    * denorm); `filterRefs` = attributes those predicates read (they may
    * include columns the input's Project already dropped). */
  /** A semi/anti join peeled off a member input: like the leaf's
    * Filters, it is a ROW FILTER on the member's rows (EXISTS / NOT
    * EXISTS decided per row by the row's own columns against an
    * independent probe subtree), so it commutes with the region's inner
    * joins and re-applies exactly above the denorm scan — at fact grain
    * instead of member grain, same predicate per row (q8's ASIA
    * membership semi-chain on orders, q21's self semi/anti on the order
    * key). The probe subtree is kept verbatim. */
  private case class SemiWrapper(probe: LogicalPlan,
      joinType: org.apache.spark.sql.catalyst.plans.JoinType,
      cond: Option[Expression], hint: JoinHint)

  private case class Peeled(input: LogicalPlan, path: Option[String],
      outputs: Seq[Attribute], filters: Seq[Expression],
      wrappers: Seq[SemiWrapper], filterRefs: Seq[Attribute],
      leafByName: Map[String, Attribute],
      hint: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo],
      leafIndex: Option[org.apache.spark.sql.execution.datasources.FileIndex] = None)

  private def peel(input: LogicalPlan,
      hint: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo]): Peeled = {
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    def walk(p: LogicalPlan, filters: Seq[Expression], wrappers: Seq[SemiWrapper])
        : Option[(LogicalRelation, Seq[Expression], Seq[SemiWrapper])] = p match {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        Some((lr, filters, wrappers))
      case f: Filter if f.condition.deterministic =>
        // non-det leaf filters (rand() sampling, input_file_name())
        // must evaluate once per MEMBER row over the member's files;
        // re-applying them at fact grain over denorm files silently
        // changes results — decline the peel (the mirror of
        // PushPredicateThroughJoin's deterministic guard)
        walk(f.child, filters ++ splitConjunctivePredicates(f.condition), wrappers)
      case pr: Project if pr.projectList.forall(_.isInstanceOf[Attribute]) =>
        walk(pr.child, filters, wrappers)
      case jn @ Join(x, probe, LeftSemi | LeftAnti, cond, h)
          if cond.forall(_.deterministic) =>
        // outer-to-inner traversal; keep original order for re-apply
        walk(x, filters, SemiWrapper(probe, jn.joinType, cond, h) +: wrappers)
      case _ => None
    }
    walk(input, Nil, Nil) match {
      case Some((lr, filters, wrappers)) =>
        val path = lr.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.map(_.toString).mkString(",")
        val leafOut = lr.outputSet
        // wrapper conditions read member columns too — they must be
        // carried and aliased like the plain filters' references
        val wrapperRefs = wrappers.flatMap(_.cond.toSeq.flatMap(_.references))
          .filter(leafOut.contains)
        Peeled(input, Some(path), input.output,
          filters, wrappers,
          (filters.flatMap(_.references) ++ wrapperRefs).distinct,
          lr.output.map(a => a.name.toLowerCase -> a).toMap, hint,
          Some(lr.relation.asInstanceOf[HadoopFsRelation].location))
      case None => Peeled(input, None, input.output, Nil, Nil, Nil, Map.empty, hint)
    }
  }

  /** Attempt to serve the flattened join region from one registered
    * meta; metas are tried best-coverage-first. */
  private def tryRewrite(spark: SparkSession, j: Join,
      metas: Seq[MaterializedJoins.Meta],
      centsMap: scala.collection.mutable.Map[Long, (Attribute, Boolean)])
      : Option[LogicalPlan] = {
    val (inputs, conds) = flatten(j)
    if (inputs.size < 2) return None
    // join conditions are re-applied at fact grain / re-bound onto the
    // rebuilt joins — a non-deterministic conjunct would re-evaluate
    // differently (same doctrine as the Filter guards in flatten/peel)
    if (conds.exists(!_.deterministic)) return None
    val peeled = inputs.map { case (in, h) => peel(in, h) }
    // candidate metas whose fact path appears EXACTLY once (a self-join
    // of the fact is ambiguous — decline)
    val candidates = metas.flatMap { m =>
      peeled.zipWithIndex.filter(_._1.path.contains(m.factPath)) match {
        case Seq((_, i)) => Some((m, i))
        case _ => None
      }
    }
    candidates
      .map { case (m, fi) => (m, fi, connectedDims(m, fi, peeled, conds)) }
      .filter { case (m, _, inc) =>
        inc.nonEmpty &&
          // every OMITTED dim must be lossless for the subset rewrite
          m.dims.forall(d => inc.exists(_._1.table == d.table) || d.lossless)
      }
      .sortBy { case (m, _, inc) => (-inc.size, m.catalogTable) }
      .view
      .flatMap { case (m, fi, inc) =>
        rebuild(spark, m, fi, inc, peeled, conds, centsMap)
      }
      .headOption
  }

  /** The dims of `m` present in the region and connected to their
    * recorded parent by the recorded key equality: (dim, inputIdx,
    * absorbed condition). Processed in meta order so parents resolve
    * before children. A dim whose path appears twice is ambiguous and
    * treated as omitted. */
  private def connectedDims(m: MaterializedJoins.Meta, factIdx: Int,
      peeled: Seq[Peeled], conds: Seq[Expression])
      : Seq[(MaterializedJoins.DimMeta, Int, Expression)] = {
    // (table -> input index) of already-included members
    val included = scala.collection.mutable.Map[String, Int](m.fact -> factIdx)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(MaterializedJoins.DimMeta, Int, Expression)]
    m.dims.foreach { d =>
      val dimIdxs = peeled.zipWithIndex.filter(_._1.path.contains(d.path)).map(_._2)
      (dimIdxs, included.get(d.parentTable)) match {
        case (Seq(di), Some(pi)) =>
          val pLeaf = peeled(pi).leafByName
          val dLeaf = peeled(di).leafByName
          val cond = conds.collectFirst {
            case eq @ EqualTo(a: AttributeReference, b: AttributeReference)
                if (pLeaf.get(d.parentKey.toLowerCase).exists(_.exprId == a.exprId) &&
                     dLeaf.get(d.dimKey.toLowerCase).exists(_.exprId == b.exprId)) ||
                   (pLeaf.get(d.parentKey.toLowerCase).exists(_.exprId == b.exprId) &&
                     dLeaf.get(d.dimKey.toLowerCase).exists(_.exprId == a.exprId)) => eq
          }
          cond.foreach { c => included(d.table) = di; out += ((d, di, c)) }
        case _ =>
      }
    }
    out.toSeq
  }

  // -------------------------------------------------------- rebuilding

  private def rebuild(spark: SparkSession, m: MaterializedJoins.Meta,
      factIdx: Int, inc: Seq[(MaterializedJoins.DimMeta, Int, Expression)],
      peeled: Seq[Peeled], conds: Seq[Expression],
      centsMap: scala.collection.mutable.Map[Long, (Attribute, Boolean)])
      : Option[LogicalPlan] = {
    if (!spark.catalog.tableExists(m.catalogTable)) return None
    val replacedIdx = (factIdx +: inc.map(_._2)).toSet
    val replaced = replacedIdx.toSeq.sorted.map(peeled)
    // FRESHNESS: the members this query reads must still be the bytes
    // the layout was staged from (the leaf's own FileIndex is in hand —
    // no extra filesystem call); drift declines loudly, once per table
    if (!replaced.forall(p => (p.path, p.leafIndex) match {
      case (Some(path), Some(idx)) => Freshness.check(
        s"${m.catalogTable}:$path", m.fingerprints.getOrElse(path, ""), idx)
      case _ => true
    })) return None
    // attributes the replaced leaves expose: join-visible outputs plus
    // local-filter references (a Filter below a pruning Project can
    // read columns the Project drops)
    val exposed = replaced.flatMap(p => p.outputs ++ p.filterRefs)
      .groupBy(_.exprId).map(_._2.head).toSeq
    if (!exposed.forall(a => m.columns.contains(a.name.toLowerCase))) return None
    // name-ambiguity guard (stage() validates member disjointness; a
    // query could still alias two leaves onto one name via self-reads)
    if (exposed.map(_.name.toLowerCase).distinct.size != exposed.size) return None

    val scan = EliminateSubqueryAliases(
      spark.table(m.catalogTable).queryExecution.analyzed)
    val byName = scan.output.map(a => a.name.toLowerCase -> a).toMap
    if (!exposed.forall(a => byName.contains(a.name.toLowerCase))) return None

    val absorbed = inc.map(_._3).toSet
    val replacedOut = AttributeSet(exposed)
    // remaining conjuncts: over-the-region filters stay above the scan;
    // cross conditions go back onto the rebuilt joins
    val (regionConds, crossConds) = conds.filterNot(absorbed.contains)
      .partition(_.references.subsetOf(replacedOut))

    val aliases: Seq[NamedExpression] = exposed.map(a =>
      Alias(byName(a.name.toLowerCase), a.name)(exprId = a.exprId))
    // carry the stored cents siblings of exposed money columns through,
    // under their own exprIds, for the ancestors' idiom rewrite
    val centsThrough: Seq[NamedExpression] = exposed.flatMap { a =>
      val n = a.name.toLowerCase
      if (m.cents.contains(n)) byName.get(n + "_cents").map { c =>
        centsMap(a.exprId.id) = (c, m.finite.contains(n)); c
      } else None
    }
    var node: LogicalPlan = Project(aliases ++ centsThrough, scan)
    val localFilters = replaced.flatMap(_.filters) ++ regionConds
    if (localFilters.nonEmpty) node = Filter(localFilters.reduce(And), node)
    // the members' semi/anti wrappers re-apply above the scan — same
    // per-row predicate at fact grain (see SemiWrapper). Only the
    // PROBE-side hint survives: the left hint described the member
    // subtree (often small enough to broadcast), not the wide scan
    replaced.foreach(_.wrappers.foreach { w =>
      node = Join(node, w.probe, w.joinType, w.cond, JoinHint(None, w.hint.rightHint))
    })

    // re-join the remaining inputs left-deep in original order; every
    // step must bind at least one condition (no cross joins) and every
    // condition must eventually bind
    val remaining = peeled.zipWithIndex.filterNot(p => replacedIdx(p._2)).map(_._1)
    var pending = crossConds
    var tree = node
    for (r <- remaining) {
      val outs = AttributeSet(tree.output ++ r.input.output)
      val (now, later) = pending.partition(_.references.subsetOf(outs))
      if (now.isEmpty) return None
      tree = Join(tree, r.input, Inner, Some(now.reduce(And)),
        JoinHint(None, r.hint)) // the input's original side hint survives
      pending = later
    }
    if (pending.nonEmpty) return None
    Some(tree)
  }

  // --------------------------------------------- semi-join subsumption

  /** `dim ⋉ parent` (EXISTS) served from the denorm as one grouped
    * scan — the q4 shape: `orders ⋉ lineitem(filtered)` is every order
    * with at least one qualifying line, which in the pre-joined table
    * is exactly `denorm WHERE <probe filters> GROUP BY <key>` with the
    * dim's columns emitted (constant per group because the stage-time
    * audit proved the dim key UNIQUE). Grouping includes the PROBE-side
    * (fact-grain) key attribute, so a denorm bucketed on it aggregates
    * exchange-free — q4 becomes scan+agg, zero joins, zero shuffles.
    *
    * Exactness requires: the semi's two leaves are adjacent members
    * joined on exactly the recorded key pair (extra conjuncts become
    * row filters — EXISTS with a compound predicate filters the paired
    * rows first); the LEFT side is a DIM with a lossless audit (unique
    * key ⇒ one output row per left row — the binding half; the left
    * rows the materialized join drops are exactly those with no fact
    * match, which the semi drops anyway); the PROBE side is the FACT —
    * every fact row is represented in the denorm when the other dims
    * are lossless (also required), whereas a non-fact probe row with
    * zero fact matches has no denorm row and its EXISTS witness would
    * be silently lost. LeftAnti is NOT served: an anti row with zero
    * matches has no denorm row to represent it. */
  private def trySemiSubsume(spark: SparkSession, j: Join,
      metas: Seq[MaterializedJoins.Meta]): Option[LogicalPlan] = {
    val left = peel(j.left, None)
    val probe = peel(j.right, None)
    if (left.path.isEmpty || probe.path.isEmpty) return None
    if (left.wrappers.nonEmpty || probe.wrappers.nonEmpty) return None
    val conds = j.condition.toSeq.flatMap(splitConjunctivePredicates)
    if (conds.exists(!_.deterministic)) return None
    metas.view.flatMap { m =>
      if (!spark.catalog.tableExists(m.catalogTable)) None
      else {
        // the left leaf must be a LOSSLESS dim whose recorded partner
        // (parent: the fact or an earlier dim) is the probe leaf
        val memberPath: Map[String, String] =
          ((m.fact -> m.factPath) +: m.dims.map(d => d.table -> d.path)).toMap
        m.dims.filter(_.lossless)
          // the probe must be the FACT: only fact rows are guaranteed
          // represented in the denorm (given lossless others below) —
          // a non-fact probe row with zero fact matches has no denorm
          // row, and its EXISTS witness would be silently lost
          .filter(d => d.parentTable == m.fact &&
            left.path.contains(d.path) && probe.path.contains(m.factPath))
          .flatMap { d =>
            val others = m.dims.filterNot(_.table == d.table)
            if (!others.forall(_.lossless)) None
            else if (!Seq(left, probe).forall(p => (p.path, p.leafIndex) match {
              case (Some(path), Some(idx)) => Freshness.check(
                s"${m.catalogTable}:$path", m.fingerprints.getOrElse(path, ""), idx)
              case _ => true
            })) None
            else {
              val keyEq = conds.collectFirst {
                case eq @ EqualTo(a: AttributeReference, b: AttributeReference)
                    if (left.leafByName.get(d.dimKey.toLowerCase).exists(_.exprId == a.exprId) &&
                         probe.leafByName.get(d.parentKey.toLowerCase).exists(_.exprId == b.exprId)) ||
                       (left.leafByName.get(d.dimKey.toLowerCase).exists(_.exprId == b.exprId) &&
                         probe.leafByName.get(d.parentKey.toLowerCase).exists(_.exprId == a.exprId)) => eq
              }
              keyEq.flatMap { eq =>
                val extra = conds.filterNot(_ == eq)
                val leafAttrs = AttributeSet(
                  left.leafByName.values.toSeq ++ probe.leafByName.values.toSeq)
                if (!extra.forall(_.references.subsetOf(leafAttrs))) None
                else {
                  val probeKeyAttr = probe.leafByName(d.parentKey.toLowerCase)
                  val exposed = (left.outputs ++ left.filterRefs ++
                    Seq(probeKeyAttr) ++ probe.filterRefs ++
                    extra.flatMap(_.references))
                    .groupBy(_.exprId).map(_._2.head).toSeq
                  if (!exposed.forall(a => m.columns.contains(a.name.toLowerCase))) None
                  else {
                    val scan = EliminateSubqueryAliases(
                      spark.table(m.catalogTable).queryExecution.analyzed)
                    val byName = scan.output.map(a => a.name.toLowerCase -> a).toMap
                    if (!exposed.forall(a => byName.contains(a.name.toLowerCase))) None
                    else if (exposed.map(_.name.toLowerCase).distinct.size != exposed.size) None
                    else {
                      val aliases: Seq[NamedExpression] = exposed.map(a =>
                        Alias(byName(a.name.toLowerCase), a.name)(exprId = a.exprId))
                      var node: LogicalPlan = Project(aliases, scan)
                      val filters = left.filters ++ probe.filters ++ extra
                      if (filters.nonEmpty) node = Filter(filters.reduce(And), node)
                      // group by the fact-grain key (bucket-aligned) +
                      // the semi's output attrs, which pass through the
                      // grouping with their exprIds intact. Filter-only
                      // columns stay OUT of the grouping: the key is the
                      // unique dim key's fact-grain twin, so every other
                      // dim column is constant per group anyway and
                      // widening the hash keys buys nothing
                      val grouping: Seq[Expression] =
                        (probeKeyAttr +: left.outputs)
                          .groupBy { case a: Attribute => a.exprId }.map(_._2.head).toSeq
                      Some(org.apache.spark.sql.catalyst.plans.logical.Aggregate(
                        grouping, left.outputs.map(a => a: NamedExpression), node))
                    }
                  }
                }
              }
            }
          }.headOption
      }
    }.headOption
  }

  // ------------------------------------------- ancestors' money idioms

  /** Rewrite `cast(round(x*100) as bigint)` / `cast(x as decimal(p,2))`
    * over substituted source attributes to the carried stored-cents
    * attributes — the same shared matchers [[RewriteStoredCents]] uses
    * (that rule runs at post-hoc resolution and never sees this plan
    * shape). Pure-column pruning Projects between the new scan and the
    * idiom are widened to forward the cents attribute; if any usage
    * still fails to resolve (an unexpected blocker), the whole cents
    * pass is abandoned and the join substitution alone is kept. */
  private def rewriteAncestorCents(plan: LogicalPlan,
      centsMap: Map[Long, (Attribute, Boolean)]): LogicalPlan = {
    if (centsMap.isEmpty) return plan
    val used = scala.collection.mutable.Set.empty[Attribute]
    val rewritten = plan.transformUp {
      case n if n.children.nonEmpty =>
        n.transformExpressionsUp {
          case c: Cast if c.dataType == LongType =>
            RewriteStoredCents.centsIdiom(c)
              .flatMap(a => centsMap.get(a.exprId.id))
              .map { case (cents, _) => used += cents; cents }
              .getOrElse(c)
          case c: Cast =>
            RewriteStoredCents.decimalIdiom(c)
              .flatMap { case (a, p) =>
                centsMap.get(a.exprId.id).collect {
                  case (cents, true) => used += cents; MakeDecimal(cents, p, 2)
                }
              }
              .getOrElse(c)
        }
    }
    if (used.isEmpty) return plan
    val widened = rewritten.transformUp {
      // ANY Project may be widened — appending an attribute its child
      // already outputs is always safe (parents bind by exprId and the
      // later pruning pass re-narrows). Round-12 fix: the pure-attr
      // restriction made every computed-grouping query (q9/q7's
      // year(o_orderdate) — PullOutGroupingExpressions inserts a
      // computed Project below the Aggregate) silently revert the whole
      // cents pass and decode raw doubles at fact grain.
      case p: Project =>
        val add = used.toSeq.sortBy(_.exprId.id)
          .filter(a => !p.outputSet.contains(a) && p.child.outputSet.contains(a))
        if (add.isEmpty) p else p.copy(projectList = p.projectList ++ add)
    }
    val usedIds = used.map(_.exprId).toSet
    val broken = widened.collectFirst {
      case n if n.missingInput.exists(a => usedIds.contains(a.exprId)) => n
    }
    if (broken.nonEmpty) plan else widened
  }
}
