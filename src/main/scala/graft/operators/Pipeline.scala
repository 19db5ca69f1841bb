package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Section C capstone: the end-to-end training-set curation query —
  * operators composed the way a production data pipeline chains them:
  *
  *   documents → language filter (en) → quality gate → exact-dedup keep rule
  *
  * Each stage is the SAME DataFrame the standalone operator returns, joined
  * on doc_id — Catalyst fuses the per-row stages into one scan-side pipeline
  * and the dedup keep-rule into one hash aggregate, so "composed" costs the
  * same as "hand-fused". The oracle composes the standalone oracle SQLs as
  * CTEs, verbatim.
  */
object Pipeline {

  val QualityThreshold = 0.35

  def curate(s: SparkSession, dir: String): DataFrame = {
    val lang = TextOps.langid(s, dir).filter(col("pred_lang") === "en")
    val qual = TextOps.quality(s, dir)
      .filter(col("quality_score") >= QualityThreshold)
      .select(col("doc_id"), col("quality_score"))
    val keep = Dedup.exact(s, dir).select(col("keep_id").as("doc_id"))
    lang.join(qual, Seq("doc_id"))
      .join(keep, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("pred_lang"), col("quality_score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> (curate _))

  def oracles: Map[String, String] = Map(
    "pipeline_curate" ->
      (s"WITH lang AS (${TextOps.oracles("text_langid")}), " +
        s"qual AS (${TextOps.oracles("text_quality")}), " +
        "keep AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)) " +
        "SELECT l.doc_id, l.pred_lang, q.quality_score FROM lang l JOIN qual q ON l.doc_id = q.doc_id " +
        s"WHERE l.pred_lang = 'en' AND q.quality_score >= $QualityThreshold " +
        "AND l.doc_id IN (SELECT keep_id FROM keep)"))
}
