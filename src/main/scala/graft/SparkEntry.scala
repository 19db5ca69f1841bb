package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, Dedup, Extras, MapReduce, Multimodal, Pipeline, Similarity, Tera, TextOps, UnigramLm}
import graft.streaming.EventStreams

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each section object contributes (queries, oracles); names must match and
  * every computed column is aliased identically in both (the driver's compare
  * sorts columns by name before hashing). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(spark, "/root/testdata/sf0.001")

  private def sections: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (MapReduce.queries, MapReduce.oracles),
      (Extras.queries, Extras.oracles),
      (Tera.queries, Tera.oracles),
      (Analytics.queries, Analytics.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (TextOps.queries, TextOps.oracles),
      (UnigramLm.queries, UnigramLm.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (EventStreams.queries, EventStreams.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sections.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records rows-only. */
  def oracleSql: Map[String, String] =
    sections.map(_._2).reduce(_ ++ _)
}
