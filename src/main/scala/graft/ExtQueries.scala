package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline extension queries (SURVEY.md §2.8) — dedup, similarity
  * search, text analysis, event windows. Populated incrementally. */
object ExtQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
  def benchQueries: Seq[String] = Seq()
}
