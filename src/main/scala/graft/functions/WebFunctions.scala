package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the "dedup by
  * canonical URL, aggregate by host" prep step crawl-derived training
  * corpora run before content-level dedup (the reference's pipelines
  * assume pre-curated inputs; this is the engine-native form of that
  * upstream step).
  *
  * Scale design: pure built-in string/regexp expressions — row-local,
  * codegen'd, no UDFs, no shuffle. Patterns stay inside the regex
  * subset Java and RE2 share, and replacement backreferences are
  * avoided entirely (prefix/rest recombination via substr instead), so
  * external engines mirror the transform bit-for-bit.
  */
object WebFunctions {

  /** scheme://authority prefix (authority = everything up to the first
    * '/', '?' or '#' past the scheme separator). */
  private val PrefixRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

  /** Lowercased host of a URL: the authority between "//" and the next
    * '/', ':', '?' or '#'. Empty string when the URL has no authority. */
  def host(url: Column): Column =
    lower(regexp_extract(url, "//([^/:?#]*)", 1))

  /** Canonical URL form: fragment stripped, scheme+authority
    * lowercased, default ports dropped (:80 for http, :443 for https),
    * and bare-authority URLs given the root path. Path and query are
    * preserved byte-for-byte (case and ordering are significant there).
    * URLs without a scheme://authority prefix pass through with only
    * the fragment stripped. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val rawPre = regexp_extract(noFrag, PrefixRe, 0)
    val rest = noFrag.substr(length(rawPre) + 1, length(noFrag))
    val pre = lower(rawPre)
    val pre2 =
      when(pre.startsWith("http://") && pre.endsWith(":80"),
        pre.substr(lit(1), length(pre) - 3))
        .when(pre.startsWith("https://") && pre.endsWith(":443"),
          pre.substr(lit(1), length(pre) - 4))
        .otherwise(pre)
    when(pre2 =!= "" && rest === "", concat(pre2, lit("/")))
      .otherwise(concat(pre2, rest))
  }
}
