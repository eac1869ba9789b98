package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Behavior, Evaluation, Extended, Governance, GraphQueries, MeteoQueries, Relational, Relational2, Relational3, TimeSeries, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All query packs, one per SURVEY.md §2 subsection. */
  def packs: Seq[QueryPack] = Seq(
    MeteoQueries,
    Relational,
    Relational2,
    Relational3,
    TrainingData,
    Extended,
    TimeSeries,
    GraphQueries,
    Behavior,
    Governance,
    Evaluation)

  private lazy val registry: Seq[GraftQuery] = packs.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
