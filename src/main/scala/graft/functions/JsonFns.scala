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
}
