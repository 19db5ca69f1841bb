package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Remaining reference workload surface (SURVEY §2A extras):
  *
  *  - `mr_streaming_pipe`: hadoop-streaming (hadoop-tools/hadoop-streaming)
  *    runs arbitrary executables over record streams via stdin/stdout. The
  *    Spark-first analog is RDD.pipe: partition-parallel process fan-out,
  *    one external process per partition — same contract, same scaling.
  *  - `mr_quasi_monte_carlo`: QuasiMonteCarlo.java estimates pi from a
  *    deterministic low-discrepancy point set; here the point stream is a
  *    portable integer LCG (Knuth multiplicative hashes) so the SQL oracle
  *    replays the exact same points — distributed generate-then-aggregate,
  *    no data read at all.
  *  - `mr_random_text`: RandomTextWriter.java generates deterministic
  *    synthetic text shards; same LCG trick indexes a fixed vocabulary.
  *    Partition-parallel via spark.range (no driver loop).
  */
object Extras {

  /** Tokens piped through an external process (`tr a-z A-Z`), then counted.
    * One process per partition, streaming stdin/stdout — the
    * hadoop-streaming execution model on Spark partitions. */
  def streamingPipe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.load(s, dir, "documents")
      .select(explode(wsTokens(col("text"))).as("word"))
      .as[String]
    val piped = words.rdd.pipe(Seq("tr", "a-z", "A-Z"))
    s.createDataset(piped).toDF("word_upper")
      .groupBy("word_upper").agg(count(lit(1)).as("cnt"))
  }

  val QmcN = 100000L

  /** Pi by quasi-random sampling: x_i, y_i from portable integer LCGs. */
  def quasiMonteCarlo(s: SparkSession, dir: String): DataFrame = {
    val m = 4294967296L // 2^32
    val x = ((col("id") * 2654435761L + 12345L) % m).cast("double") / m.toDouble
    val y = ((col("id") * 2246822519L + 54321L) % m).cast("double") / m.toDouble
    s.range(1, QmcN + 1)
      .select(when(x * x + y * y <= 1.0, 1L).otherwise(0L).as("inside"))
      .agg(count(lit(1)).as("n"),
        (sum(col("inside")).cast("double") * 4.0 / QmcN.toDouble).as("pi_estimate"))
  }

  val Vocab: Seq[String] = Seq(
    "alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")
  val RandN = 10000L

  /** Deterministic synthetic text rows (RandomTextWriter analog). */
  def randomText(s: SparkSession, dir: String): DataFrame = {
    val m = 4294967296L
    val vocab = array(Vocab.map(lit): _*)
    def pick(mult: Long, add: Long) =
      element_at(vocab, (((col("id") * mult + add) % m) % Vocab.size).cast("int") + 1)
    s.range(1, RandN + 1)
      .select(col("id"), pick(2654435761L, 7L).as("word1"), pick(2246822519L, 13L).as("word2"))
  }

  // --- wiring --------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_streaming_pipe" -> (streamingPipe _),
    "mr_quasi_monte_carlo" -> (quasiMonteCarlo _),
    "mr_random_text" -> (randomText _))

  private val vocabSql = Vocab.map(w => s"'$w'").mkString("[", ", ", "]")

  def oracles: Map[String, String] = Map(
    "mr_streaming_pipe" ->
      "SELECT upper(word) AS word_upper, count(*) AS cnt FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) GROUP BY upper(word)",
    "mr_quasi_monte_carlo" ->
      (s"SELECT count(*) AS n, CAST(sum(CASE WHEN x*x + y*y <= 1.0 THEN 1 ELSE 0 END) AS DOUBLE) * 4.0 / $QmcN AS pi_estimate FROM " +
        s"(SELECT CAST((i * 2654435761 + 12345) % 4294967296 AS DOUBLE) / 4294967296 AS x, " +
        s"CAST((i * 2246822519 + 54321) % 4294967296 AS DOUBLE) / 4294967296 AS y " +
        s"FROM generate_series(1, $QmcN) t(i))"),
    "mr_random_text" ->
      (s"SELECT i AS id, $vocabSql[CAST(((i * 2654435761 + 7) % 4294967296) % ${Vocab.size} AS INT) + 1] AS word1, " +
        s"$vocabSql[CAST(((i * 2246822519 + 13) % 4294967296) % ${Vocab.size} AS INT) + 1] AS word2 " +
        s"FROM generate_series(1, $RandN) t(i)"))
}
