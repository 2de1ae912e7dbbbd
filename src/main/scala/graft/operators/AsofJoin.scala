package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-event) join: each left row is matched to the single
  * right row with the greatest `rightTs <= leftTs` (backward, inclusive)
  * or smallest `rightTs >= leftTs` (forward) within the same key — the
  * time-series enrichment primitive (attribute an event to the most
  * recent prior state change / campaign / quote).
  *
  * Spark has no ASOF operator, and expressing it as a range join
  * (`l.ts >= r.ts` + per-key max) plans a nested-loop or an exploding
  * inequality join. This implementation is a tag-union merge instead:
  * both sides union into one frame, shuffle ONCE on the key, sort
  * in-partition by (ts, side), and a running `last(right-payload,
  * ignoreNulls)` window carries each right row forward to the left rows
  * it matches. Cost = one exchange + one sort — identical to a
  * sort-merge equi-join — with output exactly |left|. Right rows order
  * before left rows at equal ts, so an equal timestamp matches
  * (inclusive semantics, same as DuckDB's ASOF `>=`).
  *
  * At 100 TB: linear in |left|+|right|, no pair blowup; a hot key
  * serializes within its partition (the window scan is O(rows) with one
  * struct of state) — same skew profile as any per-key sort. For
  * repeated joins against the same right side, pre-bucket both sides on
  * the key (BucketingSpec) and the exchange disappears.
  *
  * NULL timestamps have no position in the time order: right rows with
  * a NULL ts are excluded (they can match nothing), and left rows with
  * a NULL ts get a NULL match (dropped under `inner`) instead of
  * whatever the NULLS-FIRST sort happened to place next to them. Among
  * right rows sharing an identical (key, ts), the lexicographically
  * GREATEST payload wins — pandas' "last in input order" is
  * partition-layout-dependent, a deterministic tie-break is not.
  */
object AsofJoin {

  /** Backward as-of join. Output: the left columns plus `matchedAs`, a
    * struct of ALL right columns from the matched row (NULL when no
    * right row precedes; dropped when `joinType = "inner"`).
    *
    * `toleranceMicros`: when set, a match older than `leftTs - tol` is
    * discarded (nulled / dropped) — both ts columns must be timestamps.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, joinType: String = "left",
      matchedAs: String = "asof", toleranceMicros: Option[Long] = None): DataFrame =
    joinImpl(left, right, keys, leftTs, rightTs, joinType, matchedAs,
      toleranceMicros, forward = false)

  /** Forward as-of join: smallest `rightTs >= leftTs` per key. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, joinType: String = "left",
      matchedAs: String = "asof", toleranceMicros: Option[Long] = None): DataFrame =
    joinImpl(left, right, keys, leftTs, rightTs, joinType, matchedAs,
      toleranceMicros, forward = true)

  private def joinImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, joinType: String, matchedAs: String,
      toleranceMicros: Option[Long], forward: Boolean): DataFrame = {
    require(Seq("left", "inner").contains(joinType),
      s"asof join supports left|inner, got $joinType")
    require(!left.columns.contains(matchedAs),
      s"matchedAs '$matchedAs' collides with a left column")
    val rightPayload = struct(right.columns.map(col): _*)
    val rightType = right.select(rightPayload).schema.head.dataType
    val lAll = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rightType).as("__r"),
        struct(left.columns.map(col): _*).as("__l")): _*)
    // a NULL-ts left row has no position in the scan (NULLS FIRST would
    // hand it a bogus carried match in forward mode): route it straight
    // to the no-match output
    val lSide = lAll.filter(col("__ts").isNotNull)
    val lNullTs = lAll.filter(col("__ts").isNull)
    val rSide = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        rightPayload.as("__r"),
        lit(null).cast(lAll.schema("__l").dataType).as("__l")): _*)
      .filter(col("__ts").isNotNull) // a NULL-ts right row matches nothing
    // backward: ascending scan, carry the latest right row forward;
    // forward: descending scan, carry the earliest following right row
    // back. __side orders right before left at equal ts either way; the
    // trailing tie-break makes the carried row among DUPLICATE right
    // timestamps the lexicographically greatest payload — deterministic
    // under any partition layout (left rows all have NULL __r, so the
    // extra key never reorders them). The tie-break projects the
    // ORDERABLE right columns only: sorting the raw __r struct fails
    // analysis when the right side carries a map column (maps have no
    // ordering in Spark); rows equal on every orderable column remain
    // an arbitrary-but-harmless pick among payloads that differ only in
    // unorderable fields.
    val orderableFields = right.schema.fields.filter(f =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
    val tie: Seq[Column] =
      if (orderableFields.isEmpty) Nil
      else Seq(struct(orderableFields.map(f => col(s"__r.${f.name}")).toSeq: _*).asc)
    val ord =
      if (forward) Seq(col("__ts").desc, col("__side").asc) ++ tie
      else Seq(col("__ts").asc, col("__side").asc) ++ tie
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = lSide.unionByName(rSide)
      .withColumn(matchedAs, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .unionByName(lNullTs.withColumn(matchedAs, col("__r")))
    val gap = toleranceMicros.map { tol =>
      val d =
        if (forward) unix_micros(col(s"$matchedAs.$rightTs")) - unix_micros(col("__ts"))
        else unix_micros(col("__ts")) - unix_micros(col(s"$matchedAs.$rightTs"))
      d <= tol
    }
    val toleranced = gap.fold(withMatch)(ok =>
      withMatch.withColumn(matchedAs, when(ok, col(matchedAs))))
    val out = toleranced.select(col("__l.*"), col(matchedAs))
    if (joinType == "inner") out.filter(col(matchedAs).isNotNull) else out
  }
}
