package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreSql, Registry}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory behind `queries`, §5 for the oracle determinism rules.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreSql.aggGroupBy(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for approximate/heuristic operators
    * (driver records a weaker rows-only check; specs bound their error). */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
