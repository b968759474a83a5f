package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextShingles
import graft.text.LangId

/** §K text analysis — language ID, quality scoring, token counting and
  * document fingerprinting over `documents`. All pure codegen'd
  * expressions (no UDFs): linear scans at 100 TB.
  */
object TextAnalysisQueries {

  private val QualityStops = Seq("the", "a", "and", "of", "to", "in")

  val defs: Seq[QueryDef] = Seq(
    // Heuristic — rows-only; accuracy vs the `lang` label is spec territory.
    QueryDef(
      "q_text_langid",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), LangId.predict(col("text")).as("pred_lang"), col("lang"))
          .orderBy("doc_id"),
      None),

    QueryDef(
      "q_text_quality",
      (s, d) => {
        val toks = TextShingles.wordTokens(col("text"))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            length(col("text")).as("char_len"),
            size(toks).as("n_tokens"),
            size(array_distinct(toks)).as("n_uniq"),
            size(filter(toks, t => t.isInCollection(QualityStops))).as("n_stop"))
          .withColumn("uniq_ratio",
            round(col("n_uniq").cast("double") / col("n_tokens"), 4))
          .withColumn("stop_ratio",
            round(col("n_stop").cast("double") / col("n_tokens"), 4))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     length(text) AS char_len,
                     CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
                     CAST(len(list_distinct(string_split(lower(text), ' '))) AS INT) AS n_uniq,
                     CAST(len(list_filter(string_split(lower(text), ' '),
                          x -> x IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS INT) AS n_stop,
                     round(len(list_distinct(string_split(lower(text), ' '))) * 1.0
                           / len(string_split(lower(text), ' ')), 4) AS uniq_ratio,
                     round(len(list_filter(string_split(lower(text), ' '),
                          x -> x IN ('the', 'a', 'and', 'of', 'to', 'in'))) * 1.0
                           / len(string_split(lower(text), ' ')), 4) AS stop_ratio
              FROM documents ORDER BY doc_id""")),

    QueryDef(
      "q_token_count",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            // single-space split (not \s+): matches the engine-wide
            // wordTokens/oracle convention so counts agree byte-for-byte
            // with string_split(text, ' ') whatever the whitespace shape.
            size(split(col("text"), " ")).as("ws_tokens"),
            regexp_count(col("text"), lit("[A-Za-z0-9]+")).as("re_tokens"),
            regexp_count(col("text"), lit("[A-Za-z]{1,4}")).as("bpe_ish"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
                     CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS re_tokens,
                     CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}')) AS INT) AS bpe_ish
              FROM documents ORDER BY doc_id""")),

    // Approximate TOP-K heavy hitters over the token stream (Misra–Gries
    // mergeable sketch): per-language most frequent words with O(k) state
    // per map task. Counts are lower bounds — rows-only; the error bound
    // is spec'd against exact counts in FrequentItemsSpec.
    QueryDef(
      "q_frequent_terms",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("lang"), explode(TextShingles.wordTokens(col("text"))).as("w"))
          .groupBy("lang")
          .agg(TextShingles.frequentItems(col("w"), 15).as("top_terms"))
          .select(col("lang"), posexplode(col("top_terms")).as(Seq("pos", "t")))
          .select(col("lang"), col("pos"), col("t.item").as("item"))
          .orderBy("lang", "pos"),
      None),

    QueryDef(
      "q_fingerprint",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
          .withColumn("fp16", substring(col("fp"), 1, 16))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
                     substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fp16
              FROM documents ORDER BY doc_id"""))
  )
}
