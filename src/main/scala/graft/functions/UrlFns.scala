package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** URL canonicalization — the corpus-curation step BEFORE URL-level
  * dedup: crawl frontiers see the same page as `HTTPS://WWW.Host:443/p?
  * utm_source=feed#frag` and `https://host/p`; canonicalizing collapses
  * the variants so the groupBy(url) dedup actually merges them.
  *
  * The expression tree is built at the CATALYST level (codegen'd builtin
  * string/regexp nodes, no UDF) so one builder serves both the Column API
  * and the SQL registration (`canonicalize_url` via GraftExtensions), and
  * each step is replayable verbatim in the DuckDB oracle:
  * fragment strip → utm_* param removal (separator-repair) → scheme+host
  * lowercasing → default-:443 port strip → leading `www.` strip →
  * trailing-slash-before-query collapse.
  */
object UrlFns {

  /** Catalyst-level builder — what `canonicalize_url(url)` expands to. */
  def canonicalizeExpr(url: Expression): Expression = {
    def lit(s: String): Expression = Literal(s)
    val noFrag = RegExpReplace(url, lit("#.*"), lit(""))
    // drop every utm_* param WITH its separator, then repair a dangling
    // first '&' (left when the '?utm_...' leading param was removed)
    val noUtm = RegExpReplace(
      RegExpReplace(noFrag, lit("[?&]utm_[^&#]*"), lit("")),
      lit("^([^?&]*)&"), lit("$1?"))
    // scheme://authority is case-insensitive; the path/query is not
    val prefix = RegExpExtract(noUtm, lit("^[A-Za-z][A-Za-z0-9+.-]*://[^/]*"), Literal(0))
    val rest = Substring(noUtm, Add(Length(prefix), Literal(1)), Length(noUtm))
    val canonPrefix =
      RegExpReplace(
        RegExpReplace(Lower(prefix), lit(":443$"), lit("")),
        lit("://www\\."), lit("://"))
    RegExpReplace(Concat(Seq(canonPrefix, rest)), lit("/\\?"), lit("?"))
  }

  def canonicalize(url: Column): Column =
    ColumnBridge.column(canonicalizeExpr(ColumnBridge.expression(url)))
}
