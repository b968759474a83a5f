package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextShingles

/** Stopword-overlap language identification heuristic — the classic cheap
  * LLM-corpus pre-filter. Scores each language's stopword set against the
  * token list and takes the argmax (deterministic tie-break: greater
  * language code wins, via struct ordering). Pure codegen'd expressions;
  * linear scan at 100 TB.
  */
object LangId {

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "est", "dans", "que", "pour"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "en", "por", "con", "para"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"))

  /** Predicted language code for a text column. */
  def predict(text: Column): Column = {
    val toks = TextShingles.wordTokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isInCollection(words))).as("score"),
        lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }
}
