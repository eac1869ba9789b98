package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query/operator exposed through [[SparkEntry]].
  *
  * @param name   stable identifier (SURVEY.md §2 inventory line)
  * @param oracle equivalent ANSI SQL the driver runs in DuckDB over the same
  *               parquet tables; None for ops not expressible in portable SQL
  *               (driver falls back to a rows-only check). Column aliases and
  *               ORDER BY must match the Spark side exactly.
  * @param run    builds the DataFrame from (session, scale-factor dir)
  */
final case class GraftQuery(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

/** A group of related queries (one per SURVEY.md §2 subsection). */
trait QueryPack {
  def all: Seq[GraftQuery]
}
