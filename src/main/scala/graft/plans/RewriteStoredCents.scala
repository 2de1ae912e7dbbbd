package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.LongType

/** Optimizer rule: read STORED integer cents instead of recomputing
  * them from doubles.
  *
  * The engine's exact-money discipline evaluates
  * `cast(round(x * 100) as bigint)` per row per money column — on a
  * 120M-row fact scan that expression (plus the double decode under it)
  * IS the q1/q6/q14/q15 cost (PERF.md: the decode-constant class,
  * 3.3–4.5× vs DuckDB with every conf lever exhausted). A layout that
  * stores the cents at WRITE time removes both: this rule rewrites the
  * expression to the stored `<col>_cents` column, and Catalyst's column
  * pruning then drops the raw double from the scan entirely. Measured
  * x200 (ProbeCentsLayout, same-window DuckDB pairs): q1 2.0×,
  * q6 1.48×, q14 1.57×, q15 1.50× — the class lands at/under 2× for
  * the first time.
  *
  * SAFETY: the rewrite changes results unless the stored column is
  * bit-identical to the expression, so it fires ONLY on relations whose
  * catalog table carries the `graft.derived.cents` property naming the
  * source column — written exclusively by
  * [[LayoutAdvisor.stageDerived]], which computes the column with the
  * exact same expression. A user table that merely happens to have an
  * `x_cents` column is never touched. The replacement is additionally
  * gated on the cents attribute being in scope at the node (a user
  * projection that dropped it blocks the rewrite rather than producing
  * an unresolved plan).
  *
  * Injected as a POST-HOC RESOLUTION rule, not an optimizer rule: the
  * operator-optimization batch runs ColumnPruning before extended
  * rules, and the pruning Project it inserts above the relation
  * excludes the (then-unreferenced) cents column — the in-scope guard
  * would block every rewrite. At post-hoc resolution the plan carries
  * only USER projections, so the stored column is still reachable
  * exactly when the user didn't drop it. At this phase implicit casts
  * are not yet folded (`x * 100` is `x * cast(100 as double)`), so
  * literal matching unwraps casts.
  *
  * Reference analog: the reference's graph-rewriting passes swap
  * subgraphs for precomputed equivalents at build time
  * (framework/rewriting.py); here the precomputation is a column the
  * layout carries. */
object RewriteStoredCents extends Rule[LogicalPlan] {

  /** Catalog-table property naming the comma-separated SOURCE columns
    * whose `<name>_cents` siblings were stored as
    * `cast(round(<name> * 100) as bigint)` at write time. */
  val Property = "graft.derived.cents"

  private def isHundred(l: Literal): Boolean = l.value match {
    case i: Int => i == 100
    case lo: Long => lo == 100L
    case d: Double => d == 100.0
    case f: Float => f == 100.0f
    case d: org.apache.spark.sql.types.Decimal => d.toDouble == 100.0
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    case l: Literal => l.value match {
      case i: Int => i == 0
      case lo: Long => lo == 0L
      case s: Short => s == 0
      case _ => false
    }
    case _ => false
  }

  /** THE exact-money idiom this rule rewrites —
    * `cast(round(x * 100) as bigint)` with a scale-0 round and the 100
    * literal matched through implicit casts: Some(x). Shared with
    * [[LayoutAdvisor.adviseDerivedCents]] so the advice can never count
    * a hit the rule will not rewrite (a drifted copy once counted
    * `round(x * 100, 2)` — scale 2 — as a cents hit and staged a dead
    * column for it). */
  private[plans] def centsIdiom(e: Expression): Option[AttributeReference] = {
    def strip(x: Expression): Expression = x match {
      case cc: Cast => strip(cc.child)
      case other => other
    }
    e match {
      case c: Cast if c.dataType == LongType => c.child match {
        case r: Round if isZero(r.scale) => r.child match {
          case m: Multiply => (strip(m.left), strip(m.right)) match {
            case (a: AttributeReference, l: Literal) if isHundred(l) => Some(a)
            case (l: Literal, a: AttributeReference) if isHundred(l) => Some(a)
            case _ => None
          }
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // source-attribute exprId -> stored cents attribute, over marked
    // relations only
    val centsFor: Map[Long, Attribute] = plan.collect {
      case lr: LogicalRelation =>
        lr.catalogTable.flatMap(_.properties.get(Property)).toSeq.flatMap { srcs =>
          val byName = lr.output.map(a => a.name.toLowerCase -> a).toMap
          srcs.split(",").map(_.trim.toLowerCase).toSeq.flatMap { s =>
            for {
              src <- byName.get(s)
              cents <- byName.get(s + "_cents") if cents.dataType == LongType
            } yield src.exprId.id -> cents
          }
        }
    }.flatten.toMap
    if (centsFor.isEmpty) return plan
    plan.transformUp {
      case n if n.children.nonEmpty =>
        val inScope = n.children.flatMap(_.output).map(_.exprId.id).toSet
        n.transformExpressionsUp {
          case c: Cast if c.dataType == LongType =>
            centsIdiom(c)
              .flatMap(a => centsFor.get(a.exprId.id))
              .filter(cents => inScope(cents.exprId.id))
              .getOrElse(c)
        }
    }
  }
}
