package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Section C (part 2) of SURVEY §2: similarity search over the `embeddings`
  * table (vec_id, embedding array<float>[64], label).
  *
  * Scale design (100 TB): the query set is small and is BROADCAST against the
  * corpus — one narrow pass, no corpus shuffle; top-k per query is a window
  * over (query, candidate) pairs whose cardinality is |Q| * |corpus|, further
  * cut by LSH bucketing in the ANN variant (only same-signature buckets
  * join). Ranking ties break on rounded score then vec_id so results are
  * deterministic across engines and runs.
  */
object Similarity {

  val NumQueries = 20
  val TopK = 5
  val NumPlanes = 8

  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** Brute-force cosine top-k: exact baseline. */
  def topkBruteforce(s: SparkSession, dir: String): DataFrame = {
    val corpus = emb(s, dir).as("c")
    val queries = emb(s, dir).filter(col("vec_id") < NumQueries).as("q")
    val scored = corpus.join(broadcast(queries), col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        round(cosineSim(col("q.embedding"), col("c.embedding")), 4).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
  }

  /** ANN via LSH buckets: join only within matching signatures, then exact
    * cosine rerank inside the bucket. Recall < 1 by construction; the
    * bruteforce variant is the exactness baseline (recall@k floor asserted
    * in SimilaritySpec). Signature math is integer-exact, so the whole
    * query is oracle-verified end to end. */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val sigd = emb(s, dir)
      .withColumn("sig", PairExpressions.lshSign(col("embedding"), NumPlanes, 64))
    val queries = sigd.filter(col("vec_id") < NumQueries).as("q")
    val corpus = sigd.as("c")
    val scored = corpus.join(broadcast(queries),
        col("q.sig") === col("c.sig") && col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        round(cosineSim(col("q.embedding"), col("c.embedding")), 4).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= TopK)
  }

  val NumCentroids = 16
  val NumProbes = 2

  /** IVF-style ANN: a coarse quantizer (here: a deterministic centroid set —
    * production trains k-means offline and broadcasts it the same way)
    * partitions the corpus into inverted lists; queries probe only the
    * `NumProbes` nearest lists. Corpus assignment is one broadcast pass
    * (|corpus| x |centroids| fused-codegen cosines); the candidate join
    * touches only probed lists — the 100 TB path where brute force cannot
    * run. Fully deterministic, so oracle-checked end to end. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cent = e.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id").asc)
    val assign = e.join(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        round(cosineSim(col("embedding"), col("cent_emb")), 4).as("ccos"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    val probes = e.filter(col("vec_id") < NumQueries).join(broadcast(cent))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cent_id"),
        round(cosineSim(col("embedding"), col("cent_emb")), 4).as("ccos"))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cent_id").asc)))
      .filter(col("prn") <= NumProbes)
      .select(col("query_id"), col("q_emb"), col("cent_id"))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    assign.join(probes, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosineSim(col("q_emb"), col("embedding")), 4).as("cos"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= TopK)
  }

  /** Int8 symmetric quantization summary per vector — the compression step
    * a 100 TB embedding store applies before ANN. Quantized value is
    * floor(v/scale + 0.5) (explicit, so any engine reproduces the exact
    * rounding); output is the per-vector scale and quantized-sum checksum. */
  def quantizeInt8(s: SparkSession, dir: String): DataFrame = {
    val scale = aggregate(col("embedding"),
      lit(0.0), (acc, v) => greatest(acc, abs(v.cast("double")))) / 127.0
    emb(s, dir)
      .withColumn("scale", scale)
      .select(
        col("vec_id"),
        col("scale"), // raw double: max/127 is bit-identical across engines
        aggregate(col("embedding"), lit(0L),
          (acc, v) => acc + floor(v.cast("double") / col("scale") + 0.5).cast("long"))
          .as("qsum"))
  }

  // --- wiring --------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> (topkBruteforce _),
    "sim_quantize_int8" -> (quantizeInt8 _),
    "sim_ann_ivf" -> (annIvf _),
    "sim_ann_lsh" -> (annLsh _))

  private val cosSql =
    "round(list_sum(list_transform(generate_series(1, 64), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) / " +
      "(sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) * " +
      "sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 4)"

  private def cosBetween(x: String, y: String): String =
    s"round(list_sum(list_transform(generate_series(1, 64), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE))) / " +
      s"(sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST($x[i] AS DOUBLE) * CAST($x[i] AS DOUBLE)))) * " +
      s"sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST($y[i] AS DOUBLE) * CAST($y[i] AS DOUBLE))))), 4)"

  /** Hyperplane-signature SQL mirroring HyperplaneSignExpr bit for bit:
    * components quantize to floor(v*1024 + 0.5) BIGINT (exact for floats),
    * plane p / dim d sign is +1 iff md5("p_d") starts >= '8' (first byte >=
    * 0x80), signature bit p set iff the integer projection sum > 0. */
  private val lshSigSql: String = {
    val planeBits = (0 until NumPlanes).map { p =>
      val dot = s"list_sum(list_transform(generate_series(1, 64), i -> " +
        s"CAST(floor(CAST(embedding[i] AS DOUBLE) * 1024 + 0.5) AS BIGINT) * " +
        s"(CASE WHEN substr(md5('${p}_' || CAST(i - 1 AS VARCHAR)), 1, 1) >= '8' THEN 1 ELSE -1 END)))"
      s"(CASE WHEN $dot > 0 THEN ${1 << p} ELSE 0 END)"
    }
    planeBits.mkString(" + ")
  }

  def oracles: Map[String, String] = Map(
    "sim_ann_lsh" ->
      (s"WITH sigd AS (SELECT vec_id, embedding, CAST($lshSigSql AS INT) AS sig FROM embeddings), " +
        s"scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos " +
        s"FROM sigd c JOIN sigd q ON q.vec_id < $NumQueries AND q.sig = c.sig AND q.vec_id <> c.vec_id) " +
        "SELECT query_id, neighbor_id, cos, rank FROM (SELECT *, CAST(row_number() OVER " +
        "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank FROM scored) " +
        s"WHERE rank <= $TopK"),
    "sim_ann_ivf" ->
      (s"WITH cent AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings WHERE vec_id < $NumCentroids), " +
        s"sa AS (SELECT e.vec_id, e.embedding, c.cent_id, ${cosBetween("e.embedding", "c.cent_emb")} AS ccos FROM embeddings e CROSS JOIN cent c), " +
        "assign AS (SELECT vec_id, embedding, cent_id FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn FROM sa) WHERE rn = 1), " +
        s"sp AS (SELECT e.vec_id AS query_id, e.embedding AS q_emb, c.cent_id, ${cosBetween("e.embedding", "c.cent_emb")} AS ccos FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < $NumQueries), " +
        s"probes AS (SELECT query_id, q_emb, cent_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, cent_id ASC) AS rn FROM sp) WHERE rn <= $NumProbes), " +
        s"cands AS (SELECT p.query_id, a.vec_id AS neighbor_id, ${cosBetween("p.q_emb", "a.embedding")} AS cos " +
        "FROM assign a JOIN probes p ON a.cent_id = p.cent_id WHERE a.vec_id <> p.query_id) " +
        "SELECT query_id, neighbor_id, cos, rank FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank FROM cands) " +
        s"WHERE rank <= $TopK"),
    "sim_quantize_int8" ->
      ("SELECT vec_id, scale, " +
        "CAST(list_sum(list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) / scale + 0.5) AS BIGINT))) AS BIGINT) AS qsum FROM " +
        "(SELECT vec_id, embedding, list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) / 127.0 AS scale FROM embeddings)"),
    "sim_topk_bruteforce" ->
      (s"WITH scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosSql AS cos " +
        s"FROM embeddings c JOIN embeddings q ON q.vec_id < $NumQueries AND q.vec_id <> c.vec_id), " +
        "ranked AS (SELECT query_id, neighbor_id, cos, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank FROM scored) " +
        s"SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= $TopK"))
}
