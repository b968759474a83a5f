package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the corpus-curation step BEFORE URL-level
  * dedup: crawl frontiers see the same page as `HTTPS://WWW.Host:443/p?
  * utm_source=feed#frag` and `https://host/p`; canonicalizing collapses
  * the variants so the groupBy(url) dedup actually merges them.
  *
  * All steps are codegen'd string/regexp expressions (scan-local, no UDF)
  * and each is replayable verbatim in the DuckDB oracle:
  * fragment strip → utm_* param removal (separator-repair) → scheme+host
  * lowercasing → default-:443 port strip → leading `www.` strip →
  * trailing-slash-before-query collapse.
  */
object UrlFns {

  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // drop every utm_* param WITH its separator, then repair a dangling
    // first '&' (left when the '?utm_...' leading param was removed)
    val noUtm = regexp_replace(
      regexp_replace(noFrag, "[?&]utm_[^&#]*", ""),
      "^([^?&]*)&", "$1?")
    // scheme://authority is case-insensitive; the path/query is not
    val prefix = regexp_extract(noUtm, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", 0)
    val rest = noUtm.substr(length(prefix) + 1, length(noUtm))
    val canonPrefix =
      regexp_replace(
        regexp_replace(lower(prefix), ":443$", ""),
        "://www\\.", "://")
    regexp_replace(concat(canonPrefix, rest), "/\\?", "?")
  }
}
