package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** URL canonicalization — the corpus-curation step BEFORE URL-level
  * dedup: crawl frontiers see the same page as `HTTPS://WWW.Host:443/p?
  * utm_source=feed#frag` and `https://host/p`; canonicalizing collapses
  * the variants so the groupBy(url) dedup actually merges them.
  *
  * The URL is split structurally FIRST (authority / path / query) and each
  * rule then applies only to its own component — utm_* stripping cannot
  * eat a path segment containing '&utm_', lowercasing cannot touch a
  * case-sensitive query value on a path-less URL, and the trailing-slash
  * collapse fires exactly once at the path/query boundary.
  *
  * The expression tree is built at the CATALYST level (codegen'd builtin
  * string/regexp nodes, no UDF) so one builder serves both the Column API
  * and the SQL registration (`canonicalize_url` via GraftExtensions), and
  * each step is replayable verbatim in the DuckDB oracle.
  */
object UrlFns {

  /** Catalyst-level builder — what `canonicalize_url(url)` expands to. */
  def canonicalizeExpr(url: Expression): Expression = {
    def lit(s: String): Expression = Literal(s)
    val noFrag = RegExpReplace(url, lit("#.*"), lit(""))
    // structural split: scheme://authority | path | query
    val prefix = RegExpExtract(noFrag, lit("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"), Literal(0))
    val rest = Substring(noFrag, Add(Length(prefix), Literal(1)), Length(noFrag))
    val path = RegExpExtract(rest, lit("^[^?#]*"), Literal(0))
    val query = Substring(rest, Add(Length(path), Literal(1)), Length(rest))
    // scheme/authority are case-insensitive; path and query are not
    val canonPrefix =
      RegExpReplace(
        RegExpReplace(Lower(prefix), lit(":443$"), lit("")),
        lit("://www\\."), lit("://"))
    // query only: drop every utm_* param WITH its separator, then repair
    // a dangling first '&' (left when the leading '?utm_...' was removed)
    val canonQuery = RegExpReplace(
      RegExpReplace(query, lit("[?&]utm_[^&#]*"), lit("")),
      lit("^&"), lit("?"))
    // collapse the trailing path slash on every NON-ROOT path ('/p/' →
    // '/p', '/' stays). Unconditional (round-7 keyed it on the original
    // query, which split '/p/' from '/p/?utm_x=1' after utm-stripping),
    // so all four of '/p', '/p/', '/p?utm_x=1', '/p/?utm_x=1' now merge
    // — the dedup-recall behavior URL-level dedup wants.
    val canonPath = If(GreaterThan(Length(path), Literal(1)),
      RegExpReplace(path, lit("/$"), lit("")), path)
    Concat(Seq(canonPrefix, canonPath, canonQuery))
  }

  def canonicalize(url: Column): Column =
    ColumnBridge.column(canonicalizeExpr(ColumnBridge.expression(url)))
}
