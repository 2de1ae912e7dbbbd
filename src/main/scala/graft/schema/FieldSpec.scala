package graft.schema

import org.apache.spark.sql.types._

/** Column definition for tabular reads.
  *
  * Mirrors the semantics of the reference's `DataFrame.Field(name, dtype,
  * ragged_rank, shape, default_value)` (reference:
  * hybridbackend/tensorflow/data/dataframe.py:157-186) re-expressed over
  * Spark's type system:
  *
  *   - `raggedRank == 0`, no shape  -> atomic column
  *   - `raggedRank == 1`            -> ArrayType(leaf)
  *   - `raggedRank == k`            -> k-deep nested ArrayType
  *   - `shape = Seq(n)`             -> fixed-length list (ArrayType +
  *                                     validated length invariant)
  *
  * Constraints enforced exactly as the reference does:
  * a fully-defined shape is required when given
  * (dataframe.py:174-177); `raggedRank > 1` cannot combine with a fixed
  * shape (dataframe.py:178-181); a field missing from a file must carry
  * a `defaultValue` (dataframe.py:638-641).
  */
final case class FieldSpec(
    name: String,
    leafType: DataType,
    raggedRank: Int = 0,
    shape: Seq[Int] = Nil,
    defaultValue: Option[Any] = None) {

  require(name.nonEmpty, "field name must be non-empty")
  require(raggedRank >= 0, s"field $name: raggedRank must be >= 0")
  require(shape.forall(_ > 0), s"field $name: shape must be fully defined (all dims > 0)")
  require(
    !(raggedRank > 1 && shape.nonEmpty),
    s"field $name: raggedRank > 1 cannot combine with a fixed shape")

  /** The Spark DataType this field reads as. */
  def dataType: DataType = {
    val listDepth = math.max(raggedRank, if (shape.nonEmpty) shape.length else 0)
    (0 until listDepth).foldLeft(leafType)((t, _) => ArrayType(t, containsNull = false))
  }

  def structField: StructField = StructField(name, dataType, nullable = defaultValue.isDefined)
}

object FieldSpec {

  /** Leaf-dtype mapping from the reference's supported physical types
    * (reference: hybridbackend/common/arrow.cc:48-73, docs/data.md:23-27)
    * to Spark types. Unsigned types have no Spark equivalent: uint32
    * widens to LongType; uint64 maps to DecimalType(20,0) for
    * correctness (callers may opt into LongType with documented
    * wraparound). float16 widens to FloatType.
    */
  val dtypeMapping: Map[String, DataType] = Map(
    "int8" -> ByteType,
    "uint8" -> ShortType,
    "int32" -> IntegerType,
    "uint32" -> LongType,
    "int64" -> LongType,
    "uint64" -> DecimalType(20, 0),
    "float16" -> FloatType,
    "float32" -> FloatType,
    "float64" -> DoubleType,
    "string" -> StringType)

  /** Derive the FieldSpec view of an existing Spark schema: each column's
    * ragged rank is its ArrayType nesting depth (the reference infers the
    * same from Parquet List levels, common/arrow.cc:42-46). */
  def fromSchema(schema: StructType): Seq[FieldSpec] =
    schema.fields.toSeq.map { f =>
      val (leaf, depth) = unnest(f.dataType, 0)
      FieldSpec(f.name, leaf, raggedRank = depth)
    }

  @annotation.tailrec
  private def unnest(t: DataType, depth: Int): (DataType, Int) = t match {
    case ArrayType(e, _) => unnest(e, depth + 1)
    case leaf => (leaf, depth)
  }
}
