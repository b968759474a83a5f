package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextSearch

/** §D text search — TEXT_CONTAINS / TEXT_MATCH over `documents.text`
  * (reference: /root/reference/basics/indexing/text-search-support.md).
  */
object TextQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_text_contains",
      (s, d) =>
        Tables.documents(s, d)
          .filter(TextSearch.textContains(col("text"), "spark"))
          .select("doc_id", "lang", "source")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, source FROM documents
              WHERE list_contains(string_split(lower(text), ' '), 'spark')
              ORDER BY doc_id""")),

    QueryDef(
      "q_text_match",
      (s, d) =>
        Tables.documents(s, d)
          .filter(TextSearch.textMatch(col("text"), "spark AND data OR \"table scan\""))
          .select("doc_id", "lang")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
              WHERE (list_contains(string_split(lower(text), ' '), 'spark')
                     AND list_contains(string_split(lower(text), ' '), 'data'))
                 OR contains(' ' || lower(text) || ' ', ' table scan ')
              ORDER BY doc_id"""))
  )
}
