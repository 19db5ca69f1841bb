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

  /** Deterministic train/val/test split: md5 of the doc id buckets every
    * document reproducibly — no RNG, stable under re-runs and re-partitions,
    * replayable by any engine. 90/5/5 by hex prefix. */
  def split(s: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("int")
    graft.sources.Tables.load(s, dir, "documents")
      .withColumn("b", bucket)
      .withColumn("split",
        when(col("b") < 230, "train").when(col("b") < 243, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
  }

  /** Benchmark decontamination: flag corpus docs (doc_id >= 10) sharing any
    * 5-gram with the held-out benchmark set (doc_id < 10) — the n-gram
    * overlap check every training pipeline runs before a data release.
    * The benchmark side is tiny and broadcasts. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ShingleExpressions
    val d = graft.sources.Tables.load(s, dir, "documents")
    def grams(df: DataFrame) = df
      .select(col("doc_id"), explode(array_distinct(
        ShingleExpressions.shingles(col("text"), 5))).as("g"))
    val bench = grams(d.filter(col("doc_id") < 10))
      .select(col("doc_id").as("bench_id"), col("g"))
    grams(d.filter(col("doc_id") >= 10)).as("c")
      .join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> (curate _),
    "pipeline_split" -> (split _),
    "pipeline_decontaminate" -> (decontaminate _))

  private val hexVal = "(strpos('0123456789abcdef', %s) - 1)"
  private val shingles5Sql =
    "list_transform(generate_series(1, len(string_split(text, ' ')) - 4), i -> array_to_string((string_split(text, ' '))[i:i+4], ' '))"

  def oracles: Map[String, String] = Map(
    "pipeline_split" ->
      ("SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM " +
        "(SELECT n_chars, CASE WHEN b < 230 THEN 'train' WHEN b < 243 THEN 'val' ELSE 'test' END AS split FROM " +
        "(SELECT n_chars, " +
        String.format(hexVal, "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)") + " * 16 + " +
        String.format(hexVal, "substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)") + " AS b " +
        "FROM documents)) GROUP BY split"),
    "pipeline_decontaminate" ->
      (s"WITH grams AS (SELECT doc_id, unnest(list_distinct($shingles5Sql)) AS g FROM documents), " +
        "bench AS (SELECT doc_id AS bench_id, g FROM grams WHERE doc_id < 10), " +
        "corpus AS (SELECT doc_id, g FROM grams WHERE doc_id >= 10) " +
        "SELECT c.doc_id, count(DISTINCT c.g) AS n_shared_grams, count(DISTINCT b.bench_id) AS n_bench_docs " +
        "FROM corpus c JOIN bench b ON c.g = b.g GROUP BY c.doc_id"),
    "pipeline_curate" ->
      (s"WITH lang AS (${TextOps.oracles("text_langid")}), " +
        s"qual AS (${TextOps.oracles("text_quality")}), " +
        "keep AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)) " +
        "SELECT l.doc_id, l.pred_lang, q.quality_score FROM lang l JOIN qual q ON l.doc_id = q.doc_id " +
        s"WHERE l.pred_lang = 'en' AND q.quality_score >= $QualityThreshold " +
        "AND l.doc_id IN (SELECT keep_id FROM keep)"))
}
