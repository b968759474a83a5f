package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pinot text-search surface — TEXT_CONTAINS and TEXT_MATCH with a small
  * Lucene-ish query language (reference: /root/reference/basics/indexing/
  * text-search-support.md:1 and native-text-index.md:1).
  *
  * Spark-native: instead of a Lucene sidecar index, term predicates are
  * codegen'd expressions over a whitespace tokenization of the column —
  * they stay inside WholeStageCodegen and scale as a scan, and at 100 TB
  * they ride on column pruning + parquet row-group skipping. Supported
  * query syntax: bare terms, `term*` prefix match, `"quoted phrase"`,
  * combined with AND / OR (AND binds tighter).
  */
object TextSearch {

  private def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** TEXT_CONTAINS(col, term): exact tokenized term containment. */
  def textContains(text: Column, term: String): Column =
    array_contains(tokens(text), term.toLowerCase)

  /** One space-normalized, space-padded form for phrase containment. */
  private def padded(text: Column): Column =
    concat(lit(" "), regexp_replace(lower(text), "\\s+", " "), lit(" "))

  private val FuzzyTerm = "(?s)(.+)~(\\d+)".r
  private val ProximityPhrase = "(?s)\"([^\"]*)\"~(\\d+)".r

  /** Lucene proximity ("a b"~slop): every phrase term appears within
    * `slop` token positions of the previous one's match. Positions come
    * from one zip_with over the token stream; the pairwise check is a
    * nested `exists` — all codegen'd HOFs, no UDF.
    */
  private def proximityPredicate(text: Column, terms: Seq[String], slop: Int): Column = {
    val toks = tokens(text)
    val indexed = zip_with(toks, sequence(lit(0), size(toks) - 1),
      (t, i) => struct(t.as("t"), i.as("i")))
    def positions(term: String): Column =
      transform(filter(indexed, s => s.getField("t") === term), s => s.getField("i"))
    val surviving = terms.map(positions).reduceLeft { (acc, next) =>
      // keep positions of the accumulated match that have a `next` term
      // within slop; non-empty result = phrase-with-slop present
      filter(acc, a => exists(next, b => abs(a - b) <= slop))
    }
    size(surviving) > 0
  }

  private def termPredicate(text: Column, term: String): Column = {
    val t = term.toLowerCase
    t match {
      case ProximityPhrase(phrase, slop) =>
        val ts = phrase.split("\\s+").filter(_.nonEmpty).toSeq
        return (
          if (ts.isEmpty) lit(false)
          else if (ts.size == 1) array_contains(tokens(text), ts.head)
          else proximityPredicate(text, ts, slop.toInt))
      case _ => ()
    }
    if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)
      contains(padded(text), lit(" " + t.substring(1, t.length - 1) + " "))
    // /regex/ term: whole-token regex match (anchored — Lucene regex terms
    // match the full token, unlike Spark's substring rlike). Matched
    // against the lowercased token stream.
    else if (t.startsWith("/") && t.endsWith("/") && t.length > 2)
      exists(tokens(text), w => w.rlike("^(?:" + t.substring(1, t.length - 1) + ")$"))
    else t match {
      // term~N fuzzy: any token within Levenshtein distance N
      // (levenshtein is codegen'd; the bounded 3-arg form short-circuits
      // rows whose distance exceeds N instead of computing it fully).
      case FuzzyTerm(base, n) if n.toInt >= 0 =>
        val maxD = n.toInt
        exists(tokens(text), w => levenshtein(w, lit(base), maxD) >= 0)
      // trailing-* prefix fast path: plain startsWith, no regex engine
      case _ if t.endsWith("*") && t.length > 1 &&
          t.indexOf('*') == t.length - 1 && !t.contains('?') =>
        exists(tokens(text), w => w.startsWith(lit(t.dropRight(1))))
      // Lucene WildcardQuery (`te?t`, `t*st`): `*` = any run, `?` = any one
      // char, anchored to the whole token. Compiled once per query into an
      // anchored regex; evaluated as a codegen'd scan predicate.
      case _ if t.contains('*') || t.contains('?') =>
        exists(tokens(text), w => w.rlike("^(?:" + wildcardRegex(t) + ")$"))
      case _ =>
        array_contains(tokens(text), t)
    }
  }

  /** Translate a Lucene wildcard term to a regex: `*`→`.*`, `?`→`.`,
    * everything else literally (regex metacharacters escaped).
    */
  private def wildcardRegex(t: String): String =
    t.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => "\\" + c
      case c => c.toString
    }

  /** TEXT_MATCH(col, query): full boolean queries over terms, prefixes,
    * phrases, `term~N` fuzzy (edit-distance ≤ N), `/regex/` whole-token
    * regex terms and PARENTHESIZED groups — `(a OR b) AND NOT (c OR d)`.
    * Precedence: NOT > AND (and adjacency = implicit AND, the Lucene
    * MUST-ish default this surface has always used) > OR. Parsed by a
    * recursive-descent parser into one composed Column predicate — the
    * whole query stays a codegen'd scan expression, no UDF.
    * Reference: /root/reference/basics/indexing/text-search-support.md:22
    * (phrase, term, regex, fuzzy and composite/grouped query families).
    */
  def textMatch(text: Column, query: String): Column =
    compile(text, parseQuery(query))

  /** Parsed TEXT_MATCH query tree — also consumed by
    * graft.sources.TextIndex.searchBool, which evaluates the same tree
    * as posting-list set algebra instead of a scan predicate.
    */
  sealed trait QNode
  final case class QTerm(raw: String) extends QNode
  final case class QAnd(l: QNode, r: QNode) extends QNode
  final case class QOr(l: QNode, r: QNode) extends QNode
  final case class QNot(c: QNode) extends QNode

  /** Parse the boolean query grammar to a tree. */
  def parseQuery(query: String): QNode = {
    // lex: quoted phrases (with optional ~slop) and /regex/ terms are
    // single tokens even when they contain parens; bare parens delimit
    // groups; everything else splits on whitespace and parens.
    val lexed =
      "\"[^\"]*\"(?:~\\d+)?|/[^/]*/|\\(|\\)|[^\\s()]+".r.findAllIn(query).toList
    val p = new BoolParser(lexed)
    val res = p.parseOr()
    require(p.atEnd, s"trailing tokens in TEXT_MATCH query: $query")
    res
  }

  /** Compile a query tree to one scan predicate Column. */
  def compile(text: Column, n: QNode): Column = n match {
    case QTerm(raw) => termPredicate(text, raw)
    case QAnd(l, r) => compile(text, l) && compile(text, r)
    case QOr(l, r) => compile(text, l) || compile(text, r)
    case QNot(c) => !compile(text, c)
  }

  /** Recursive-descent boolean parser over the lexed token list. */
  private final class BoolParser(tokens: List[String]) {
    private var rest: List[String] = tokens
    def atEnd: Boolean = rest.isEmpty
    private def peek: Option[String] = rest.headOption
    private def advance(): String = { val h = rest.head; rest = rest.tail; h }

    def parseOr(): QNode = {
      var acc = parseAnd()
      while (peek.exists(_.equalsIgnoreCase("OR"))) {
        advance()
        acc = QOr(acc, parseAnd())
      }
      acc
    }

    private def startsPrimary(t: String): Boolean =
      !t.equalsIgnoreCase("OR") && !t.equalsIgnoreCase("AND") && t != ")"

    private def parseAnd(): QNode = {
      var acc = parseNot()
      var continue = true
      while (continue) {
        peek match {
          case Some(t) if t.equalsIgnoreCase("AND") =>
            advance(); acc = QAnd(acc, parseNot())
          case Some(t) if startsPrimary(t) => // implicit AND by adjacency
            acc = QAnd(acc, parseNot())
          case _ => continue = false
        }
      }
      acc
    }

    private def parseNot(): QNode =
      peek match {
        case Some(t) if t.equalsIgnoreCase("NOT") => advance(); QNot(parseNot())
        case _ => parsePrimary()
      }

    private def parsePrimary(): QNode =
      peek match {
        case Some("(") =>
          advance()
          val inner = parseOr()
          require(peek.contains(")"), "unbalanced parentheses in TEXT_MATCH query")
          advance()
          inner
        case Some(t) if startsPrimary(t) =>
          advance(); QTerm(t)
        case other =>
          throw new IllegalArgumentException(
            s"expected term or group in TEXT_MATCH query, found $other")
      }
  }
}
