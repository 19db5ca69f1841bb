package graft

import graft.operators.Similarity

/** ANN quality gate (VERDICT r1 #4): an ANN path that is never measured for
  * recall is not an ANN feature. Recall@k here = |ann-top-k ∩ exact-top-k| /
  * |exact-top-k| summed over all queries, with sim_topk_bruteforce as ground
  * truth on the same data.
  */
class SimilaritySpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact = pairs(Similarity.topkBruteforce(spark, sf))

  private def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
    val got = pairs(df)
    (got & exact).size.toDouble / exact.size
  }

  test("sim_ann_lsh recall@5 vs bruteforce meets the floor") {
    val r = recallOf(Similarity.annLsh(spark, sf))
    info(f"LSH recall@${Similarity.TopK} = $r%.3f")
    assert(r >= 0.6, s"LSH recall $r below floor")
  }

  test("sim_ann_ivf recall@5 vs bruteforce meets the floor") {
    val r = recallOf(Similarity.annIvf(spark, sf))
    info(f"IVF recall@${Similarity.TopK} = $r%.3f")
    assert(r >= 0.6, s"IVF recall $r below floor")
  }

  test("knn graph plans the custom TopKPerKey operator, bounds degree, and overlaps exact top-3") {
    import org.apache.spark.sql.functions._
    val g = Similarity.knnGraph(spark, sf)
    assert(g.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "knn graph must rank through the custom physical operator")
    val maxDeg = g.groupBy("src").count().agg(max("count")).collect().head.getLong(0)
    assert(maxDeg <= Similarity.GraphK)
    // graph edges for the query vectors vs their exact top-3: LSH-bucketed
    // approximation, so partial overlap — assert a floor
    val graphEdges = g.filter(col("src") < Similarity.NumQueries)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact3 = Similarity.topkBruteforce(spark, sf)
      .filter(col("rank") <= Similarity.GraphK)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (graphEdges & exact3).size.toDouble / exact3.size
    info(f"knn-graph top-3 recall = $recall%.3f")
    assert(recall >= 0.5, s"knn graph recall $recall below floor")
  }

  test("trained IVF centroids do not lose recall vs the untrained init") {
    val untrained = recallOf(Similarity.annIvfIters(spark, sf, 0))
    val trained = recallOf(Similarity.annIvf(spark, sf))
    info(f"IVF recall@5: untrained=$untrained%.3f trained=$trained%.3f")
    assert(trained >= untrained,
      s"training regressed recall: $trained < $untrained")
  }
}
