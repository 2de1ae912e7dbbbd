package graft.operators

import graft.functions.WebFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Host-level corpus curation: the "cap documents per domain" step
  * crawl-derived training corpora apply so that a handful of enormous
  * hosts cannot dominate the training mixture (the C4 / RefinedWeb /
  * Gopher recipes all carry a per-domain cap; the reference's pipelines
  * assume it already happened upstream — this is the engine-native
  * form).
  *
  * Scale design: URLs canonicalize row-locally
  * ([[graft.functions.WebFunctions]], codegen'd regexp/substr — no
  * UDFs), then ONE hash exchange on the host key feeds a rank window.
  * Spark plans a partial `WindowGroupLimit` BEFORE the exchange, so at
  * most `n` rows per host per input partition travel — the shuffle
  * volume is bounded by n × hosts, not by corpus size, and a
  * pathological million-doc host never concentrates on one task's
  * input beyond its first n survivors per upstream partition.
  */
object WebCuration {

  /** Keep at most `n` documents per canonical host, preferring by
    * `order` (callers MUST make the ordering total — e.g. quality
    * descending with a unique-id tiebreak — or survivors are
    * nondeterministic under retries). Adds `host` (canonical lowercased
    * host of `url`) and `host_rank` (1-based preference rank within the
    * host) to the output.
    *
    * Rows with NO extractable host (relative/path-only/null URLs) BYPASS
    * the cap with `host_rank` NULL: they share no domain, so capping
    * them as one giant pseudo-host would both drop valid documents by
    * accident of URL form and funnel every such row through a single
    * window partition (a skew cliff at crawl scale). */
  def hostCap(df: DataFrame, url: Column, n: Int, order: Seq[Column]): DataFrame = {
    require(n > 0, s"hostCap needs n > 0, got $n")
    require(order.nonEmpty, "hostCap needs a deterministic preference order")
    // same collision discipline as AsofJoin.matchedAs: silently
    // clobbering a caller's existing host/host_rank would re-derive and
    // re-group on different values with no error
    require(!df.columns.contains("host") && !df.columns.contains("host_rank"),
      "hostCap adds 'host' and 'host_rank'; rename or drop the existing columns first")
    val withHost = df.withColumn("host",
      WebFunctions.host(WebFunctions.normalizeUrl(url)))
    val hosted = withHost.filter(col("host").isNotNull && col("host") =!= "")
      .withColumn("host_rank",
        row_number().over(Window.partitionBy(col("host")).orderBy(order: _*)))
      .filter(col("host_rank") <= n)
    val hostless = withHost.filter(col("host").isNull || col("host") === "")
      .withColumn("host_rank", lit(null).cast("int"))
    hosted.unionByName(hostless)
  }

  /** Drop documents whose `host` appears in a blocklist (the C4-style
    * badlist step). `blocked` must have a single `host` column and is
    * assumed dimension-sized (curated blocklists are thousands to
    * millions of rows — far under the broadcast threshold): the filter
    * is a broadcast LEFT ANTI join, so the corpus never shuffles. */
  def blocklistFilter(df: DataFrame, host: Column, blocked: DataFrame): DataFrame = {
    val b = broadcast(blocked.select(col("host").as("__blocked_host")).distinct())
    df.join(b, host === col("__blocked_host"), "left_anti")
  }
}
