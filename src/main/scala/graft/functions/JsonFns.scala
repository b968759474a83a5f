package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Pinot JSON_MATCH over nested documents (reference:
  * /root/reference/basics/indexing/json-index.md:16-40 — the index is built
  * around array-of-object paths like `$.addresses[*].country`).
  *
  * Spark-native: the array path is extracted with `get_json_object`
  * (codegen'd), parsed once with `from_json`, and the `[*]` predicate is an
  * `exists()` higher-order function — all inside WholeStageCodegen, no
  * shuffle, no UDF. At 100 TB this is a pure scan predicate that rides on
  * column pruning, which is the Spark analog of Pinot flattening nested
  * records into the json index.
  */
object JsonFns {

  /** Parse `path` (a JSON array of objects) into `array<struct>`. */
  def jsonArray(json: Column, path: String, elementSchema: StructType): Column = {
    val arr = if (path == "$") json else get_json_object(json, path)
    from_json(arr, ArrayType(elementSchema))
  }

  /** JSON_MATCH with an arbitrary per-element predicate:
    * `jsonMatch(person, "$.addresses", schema, a => a("country") === "us")`
    * is Pinot's `JSON_MATCH(person, '"$.addresses[*].country"=''us''')`.
    */
  def jsonMatch(json: Column, arrayPath: String, elementSchema: StructType)(
      pred: Column => Column): Column =
    exists(jsonArray(json, arrayPath, elementSchema), pred)

  /** Pinot-style JSON_MATCH condition string over one `[*]` array path:
    * `"$.addresses[*].country" = 'us'`, also `!=  >  >=  <  <=`. Values
    * in single quotes are strings; bare values are numbers.
    */
  def jsonMatchSyntax(json: Column, condition: String, elementSchema: StructType): Column = {
    val Cond = """\s*"\$\.([^"\[]+)\[\*\]\.([^"]+)"\s*(!=|>=|<=|=|>|<)\s*(.+?)\s*""".r
    condition match {
      case Cond(arrayField, leaf, op, rawVal) =>
        val value: Any =
          if (rawVal.startsWith("'") && rawVal.endsWith("'"))
            rawVal.substring(1, rawVal.length - 1)
          else rawVal.toDouble
        jsonMatch(json, s"$$.$arrayField", elementSchema) { e =>
          val f = e.getField(leaf)
          op match {
            case "="  => f === value
            case "!=" => f =!= value
            case ">"  => f > value
            case ">=" => f >= value
            case "<"  => f < value
            case "<=" => f <= value
          }
        }
      case _ => throw new IllegalArgumentException(
        s"unsupported JSON_MATCH condition: $condition " +
          "(expected \"$.array[*].field\" <op> value)")
    }
  }

  /** Schema-FREE Pinot JSON_MATCH — the form the SQL front-end registers
    * as `json_match(col, '<condition>')` (reference: json-index.md:306 —
    * `JSON_MATCH(person, '"$.name"=''adam''')`). Supported conditions,
    * combinable with top-level AND:
    *   - `"$.path" <op> value` — scalar paths, `[N]` positional paths and
    *     `[*]` wildcard paths (wildcard = exists over the matched values);
    *     ops `= != > >= < <=`; single-quoted values are strings, bare
    *     values numbers
    *   - `"$.path" IS NULL` / `IS NOT NULL`
    *
    * Spark-native: `get_json_object` (codegen'd path evaluation) yields
    * either a scalar or a JSON array of the wildcard matches; the array
    * case is parsed as `array<string>` and the predicate becomes an
    * `exists()` HOF. Everything stays a scan predicate — the same
    * pruning-friendly shape as the schema'd jsonMatch above, without
    * needing the element struct declared.
    */
  def jsonMatchSql(json: Column, condition: String): Column =
    splitAnd(condition).map(one => jsonMatchOne(json, one))
      .reduceLeft(_ && _)

  /** Split on top-level AND (case-insensitive, respecting ''-escaped
    * single-quoted values).
    */
  private def splitAnd(condition: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var inStr = false
    var start = 0
    var i = 0
    while (i < condition.length) {
      val c = condition.charAt(i)
      if (inStr) {
        if (c == '\'') {
          if (i + 1 < condition.length && condition.charAt(i + 1) == '\'') i += 1
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'A' | 'a' if depth == 0 &&
            condition.regionMatches(true, i, "AND", 0, 3) &&
            i > 0 && condition.charAt(i - 1).isWhitespace &&
            i + 3 < condition.length && condition.charAt(i + 3).isWhitespace =>
          out += condition.substring(start, i); start = i + 3; i += 2
        case _ => ()
      }
      i += 1
    }
    require(!inStr, s"unterminated string in JSON_MATCH condition: $condition")
    out += condition.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private val NullCond =
    """(?is)\s*"([^"]+)"\s+IS\s+(NOT\s+)?NULL\s*""".r
  private val CmpCond =
    """(?s)\s*"([^"]+)"\s*(!=|>=|<=|=|>|<)\s*(.+?)\s*""".r

  private def jsonMatchOne(json: Column, condition: String): Column =
    condition match {
      case NullCond(path, not) =>
        val raw = get_json_object(json, path)
        if (not == null) raw.isNull else raw.isNotNull
      case CmpCond(path, op, rawVal) =>
        val raw = get_json_object(json, path)
        // wildcard/positional paths come back as a JSON array literal for
        // MULTIPLE matches, but as the raw JSON of the element (string
        // values still carrying their quotes) for a SINGLE match —
        // normalize both shapes to array<string>
        val scalar = regexp_replace(raw, "(?s)^\"(.*)\"$", "$1")
        // try-array-else-scalar: a scalar STRING value may itself start
        // with '[' (get_json_object returns it unquoted), so the array
        // branch additionally requires the text to PARSE as a JSON array
        // — otherwise `"$.k"='[tag] hi'` would silently never match.
        // (A string value whose text is itself a valid JSON array stays
        // ambiguous under get_json_object's normalization; the element-
        // wise compare is the useful reading of that corner.)
        val parsed = from_json(raw, ArrayType(org.apache.spark.sql.types.StringType))
        val vals = when(raw.startsWith("[") && parsed.isNotNull, parsed)
          .otherwise(array(scalar))
        val strVal = rawVal.startsWith("'") && rawVal.endsWith("'") && rawVal.length >= 2
        def cmp(v: Column): Column = {
          val (l, r): (Column, Column) =
            if (strVal) (v, lit(rawVal.substring(1, rawVal.length - 1).replace("''", "'")))
            else (v.cast(org.apache.spark.sql.types.DoubleType), lit(rawVal.toDouble))
          op match {
            case "="  => l === r
            case "!=" => l =!= r
            case ">"  => l > r
            case ">=" => l >= r
            case "<"  => l < r
            case "<=" => l <= r
          }
        }
        exists(vals, cmp)
      case _ => throw new IllegalArgumentException(
        s"unsupported JSON_MATCH condition: $condition " +
          """(expected "$.path" <op> value | "$.path" IS [NOT] NULL, AND-combinable)""")
    }
}
