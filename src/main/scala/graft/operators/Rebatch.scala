package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import scala.jdk.CollectionConverters._

/** Batch-size normalization at the consumer boundary.
  *
  * The reference's rebatch operator re-slices scan output into
  * exactly-batch_size batches for the training loop (reference:
  * hybridbackend/tensorflow/data/rebatch/rebatch_dataset_v2.cc:46-171).
  * Spark DataFrames are unbatched row streams, so batch size only
  * exists where rows leave the engine; this module provides that
  * surface. Inside the engine the rebatch *guarantee* — results
  * independent of file/row-group layout — is a tested property
  * (SourcesSpec/PropertySpec), not an operator.
  */
object Rebatch {

  /** Exactly-`batchSize` row batches (last batch may be short, or is
    * dropped when `dropRemainder`) — the `batch(batch_size,
    * drop_remainder)` contract at the driver iterator boundary. */
  def batches(df: DataFrame, batchSize: Int, dropRemainder: Boolean = false): Iterator[Seq[Row]] = {
    val it = df.toLocalIterator().asScala.grouped(batchSize)
    if (dropRemainder) it.filter(_.size == batchSize) else it.map(_.toSeq)
  }

  /** Partition layout of ~`batchSize` rows per partition — for sinks
    * that consume per-partition (e.g. Arrow batches to an ML framework;
    * the distributed analog of rebatch). Sizing needs the row count:
    * pass `rowCount` when the caller already knows it (a metastore
    * count, a previous action) to skip the extra counting job this
    * otherwise runs — at the consumer boundary that one cheap
    * count-only pass (column-pruned to zero data columns) is the price
    * of exact batch layout. */
  def partitionsOf(df: DataFrame, batchSize: Int, rowCount: Option[Long] = None): DataFrame = {
    val rows = rowCount.getOrElse(df.count())
    val n = math.max(1L, (rows + batchSize - 1) / batchSize)
    // a Long->Int wrap here would pass a garbage partition count to
    // repartition (0/negative throws, other wraps silently mis-size)
    require(n <= Int.MaxValue,
      s"partitionsOf: $rows rows / batchSize=$batchSize needs $n partitions " +
        s"(> Int.MaxValue); raise batchSize")
    df.repartition(n.toInt)
  }
}
