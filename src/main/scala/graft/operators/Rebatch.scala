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
    * the distributed analog of rebatch). */
  def partitionsOf(df: DataFrame, batchSize: Int): DataFrame = {
    val n = math.max(1L, (df.count() + batchSize - 1) / batchSize)
    df.repartition(n.toInt)
  }
}
