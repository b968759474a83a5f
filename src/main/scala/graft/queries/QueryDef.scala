package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2: a named Spark query over the sf-dir
  * tables plus (when the semantics are exactly SQL-expressible) a DuckDB
  * oracle the driver hash-compares against. Approximate/heuristic operators
  * (HLL, t-digest, MinHash, LSH, …) omit the oracle and are bounded by
  * ScalaTest specs instead.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[QueryDef] =
    CoreSql.defs ++ AdvancedQueries.defs ++ TransformQueries.defs ++
      DateTimeQueries.defs ++ JsonQueries.defs ++
      TextQueries.defs ++ MultiValueQueries.defs ++ JoinQueries.defs ++
      UpsertQueries.defs ++ StarTreeQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ TextAnalysisQueries.defs ++ MultimodalQueries.defs ++
      SamplingQueries.defs ++ CorpusQueries.defs ++ BehaviorQueries.defs ++
      FeatureQueries.defs ++ PqlQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
