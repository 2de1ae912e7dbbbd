package graft

/** Guards on the driver contract itself: every query entry must be
  * runnable and every oracle key must reference an existing query — a
  * stray key would silently weaken (or break) the driver's correctness
  * gate. */
class ContractSpec extends GraftSpec {

  /** Queries the driver checks rows-only BY DESIGN: their defining
    * computation is iterative (BPE merge training, Jacobi eigensolve)
    * and has no ANSI-SQL expression. Each must carry spec-level goldens
    * + determinism proofs instead (LlmPrepSpec / MiscSpec). Additions
    * here need that justification — an oracle-able query must stay
    * oracled. */
  private val rowsOnlyByDesign = Set("text_bpe_tokens", "embedding_pca_project")

  test("every oracle key has a query; every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle keys without a query: ${o -- q}")
    assert((q -- o) == rowsOnlyByDesign,
      s"queries without an oracle beyond the documented rows-only set: ${q -- o -- rowsOnlyByDesign}")
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL contains no tabs or carriage returns (json-dump hygiene)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains('\t') && !sql.contains('\r'), k)
    }
  }
}
