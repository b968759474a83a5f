package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join via symmetric-delete blocking — the
  * SymSpell method (public algorithm, Garbe 2012): two strings within
  * Levenshtein distance 1 necessarily share a member of
  * {s} ∪ deletes1(s) (delete-at-i covers deletion/insertion; deleting
  * the differing position on both sides covers substitution). Generating
  * that (L+1)-sized key set per string turns the O(n²) all-pairs edit
  * scan into an equi-join on the key, with exact `levenshtein` verify on
  * the (tiny) candidate set — the same block-then-verify discipline as
  * every dedup operator here (MinHash bands, sign-LSH, KMeans cells).
  *
  * Scale posture: entity/name tables are dictionary-sized relative to the
  * fact data, keys are scan-local codegen (substr/concat HOF — no
  * regex/hash in the lambda), and each key bucket holds only a deletion
  * neighborhood — bounded fan-out, no cartesian node. For distance d > 1
  * the same construction needs the d-delete neighborhood (L^d keys);
  * this operator implements the d = 1 form.
  */
object FuzzyJoin {

  /** Distinct value pairs of `strCol` within edit distance 1.
    * Output: (a_name, b_name) with a_name < b_name.
    */
  def nearPairs(df: DataFrame, strCol: String): DataFrame = {
    val n = col("name")
    val dels = transform(sequence(lit(1), length(n)), i =>
      concat(n.substr(lit(1), i - 1), n.substr(i + 1, length(n))))
    val kv = df.select(col(strCol).as("name")).distinct()
      .select(n, explode(array_union(array(n), dels)).as("k"))
    kv.as("a").join(kv.as("b"),
        col("a.k") === col("b.k") && col("a.name") < col("b.name"))
      .select(col("a.name").as("a_name"), col("b.name").as("b_name"))
      .distinct()
      // bounded 3-arg levenshtein: banded O(k·n) DP with early exit
      // (returns -1 past the threshold) instead of the full O(n·m) table
      .filter(levenshtein(col("a_name"), col("b_name"), 1) >= 0)
  }
}
