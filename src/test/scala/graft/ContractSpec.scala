package graft

/** Guards on the driver contract itself: every query entry must be
  * runnable and every oracle key must reference an existing query — a
  * stray key would silently weaken (or break) the driver's correctness
  * gate. */
class ContractSpec extends GraftSpec {

  /** Queries the driver checks rows-only BY DESIGN. As of round 7 the
    * set is EMPTY: the two former members (BPE training, Jacobi
    * eigensolve — iterative, no ANSI-SQL expression) now gate their
    * SQL-provable invariants instead (detok losslessness / Bessel +
    * centering + variance ordering), with merge-rank / eigens goldens
    * spec-asserted (LlmPrepSpec / MiscSpec). Additions here need an
    * is-not-SQL-expressible justification — an oracle-able query must
    * stay oracled. */
  private val rowsOnlyByDesign = Set.empty[String]

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

  test("every gate output column is scalar (driver row-sorter contract)") {
    // The driver sorts result rows through pandas, which crashes on a
    // non-scalar cell ("unhashable type: numpy.ndarray" — the r6
    // input_layer_assemble failure). Arrays/structs/maps must leave the
    // gate serialized via the rawCsv/numCsv convention. check.py
    // mirrors this guard python-side.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val exempt = Set( // side-effecting builders (write temp files / run
                      // a stream); their scalar-only schemas are pinned
                      // by their own green driver gates
      "scan_orc_roundtrip", "stream_dedup_ids")
    SparkEntry.queries.keys.filterNot(exempt).toSeq.sorted.foreach { name =>
      val bad = SparkEntry.queries(name)(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[MapType] => s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(bad.isEmpty,
        s"$name outputs non-scalar columns ${bad.mkString(", ")} — serialize via rawCsv/numCsv")
    }
  }

}
