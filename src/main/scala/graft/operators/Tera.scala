package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** TeraSort suite fidelity (SURVEY §2A): the reference ships TeraGen /
  * TeraSort / TeraChecksum / TeraValidate as its flagship benchmark
  * (hadoop-mapreduce-examples/src/main/java/org/apache/hadoop/examples/
  * terasort/TeraGen.java, TeraSort.java:58, TeraChecksum.java:37,
  * TeraValidate.java:43, GenSort.java, Unsigned16.java).
  *
  * Spark-first re-expression:
  *  - TeraGen's 128-bit GenSort LCG exists to make records deterministic and
  *    partition-independent; the portable equivalent here is md5 over the row
  *    id (the same trick as mr_quasi_monte_carlo) — any engine replays it,
  *    and `spark.range` gives partition-parallel generation with no driver
  *    loop and no data read. Record shape matches GenSort: 10-byte key
  *    (20 hex chars) + 90-byte value (10-char zero-padded rowid + 80-char
  *    deterministic filler) = the canonical 100-byte record.
  *  - TeraSort's InputSampler + TotalOrderPartitioner is exactly Spark's
  *    range-partitioned global `orderBy`: sample, pick range bounds,
  *    shuffle each record to its range — one shuffle, no single-reducer
  *    bottleneck, linear scaling to 100 TB (the original TeraSort record
  *    holder shape).
  *  - TeraChecksum folds every record through an order-independent sum of
  *    per-record digests, so the checksum is identical whatever the
  *    partitioning/ordering — validated against the oracle's replay.
  *  - TeraValidate (global order + per-partition boundary check) is the
  *    sortedness spec in PlansSpec plus the checksum query here.
  */
object Tera {

  val TeraN = 100000L

  /** Deterministic TeraGen-shaped records: (row_id, 10-byte key, 90-byte
    * value), generated partition-parallel from the row id alone. */
  def teragen(s: SparkSession, dir: String): DataFrame = teragenN(s, TeraN)

  /** Size-parameterized variant — the scale-stress harness (graft.Scale)
    * generates 10x/100x record sets through the same derivation. */
  def teragenN(s: SparkSession, n: Long): DataFrame = {
    val idStr = col("id").cast("string")
    s.range(0, n).select(
      col("id").as("row_id"),
      substring(md5Hex(idStr), 1, 20).as("key"),
      concat(
        lpad(idStr, 10, "0"),
        repeat(substring(md5Hex(concat(lit("v"), idStr)), 1, 8), 10)).as("value"))
  }

  /** TeraSort: range-partitioned total-order sort of the generated records.
    * Content is oracle-checked; global sortedness + range partitioning are
    * asserted in PlansSpec (the driver compare is order-insensitive). */
  def terasort(s: SparkSession, dir: String): DataFrame =
    teragen(s, dir).orderBy(col("key")).select(col("key"), col("value"))

  /** TeraChecksum: order-independent checksum over all records — per-record
    * digest is the top 40 bits of md5(key || value) (exact in any engine's
    * 64-bit sum: 2^40 * 100k < 2^57), summed with record count. */
  def terachecksum(s: SparkSession, dir: String): DataFrame =
    teragen(s, dir)
      .select(conv(substring(md5Hex(concat(col("key"), col("value"))), 1, 10), 16, 10)
        .cast("long").as("cksum"))
      .agg(count(lit(1)).as("n_records"), sum(col("cksum")).as("checksum"))

  /** Bit-faithful TeraGen: the EXACT 100-byte gensort records (128-bit LCG
    * skip-ahead, GenSort.generateRecord layout — see GensortLcg), generated
    * partition-parallel from `spark.range`. Not oracle-gated: 128-bit
    * modular multiplication has no ANSI-SQL replay, so fidelity is
    * spec-verified instead (TeraSpec: closed-form LCG cross-check + record
    * layout + DataFrame/local agreement). `mr_teragen` stays the gated
    * md5 default; this is the interop path whose output byte-matches
    * reference TeraGen / gensort 1.1. */
  def teragenGensort(s: SparkSession, n: Long = TeraN): DataFrame =
    s.range(0, n).select(
      col("id").as("row_id"),
      GensortExpressions.gensortRecord(col("id")).as("record"))

  val RandBinN = 10000L

  /** RandomWriter's binary-KV variant (RandomWriter.java): deterministic
    * per-record binary key/value sizes and md5-derived content. The query
    * surfaces the portable derivation (id, key digest, value length); the
    * BytesWritable SequenceFile round-trip of the same records is
    * spec-tested via Tables.writeSequenceFileBinary. */
  def randomBinary(s: SparkSession, dir: String): DataFrame = {
    val idStr = col("id").cast("string")
    s.range(0, RandBinN).select(
      col("id"),
      md5Hex(idStr).as("key_md5"),
      (lit(100) + (col("id") % 900)).cast("int").as("value_len"))
  }

  // --- wiring --------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_teragen" -> (teragen _),
    "mr_terasort" -> (terasort _),
    "mr_terachecksum" -> (terachecksum _),
    "mr_random_binary" -> (randomBinary _))

  private val genSql =
    s"SELECT i AS row_id, substr(md5(CAST(i AS VARCHAR)), 1, 20) AS key, " +
      "lpad(CAST(i AS VARCHAR), 10, '0') || repeat(substr(md5('v' || CAST(i AS VARCHAR)), 1, 8), 10) AS value " +
      s"FROM generate_series(0, ${TeraN - 1}) t(i)"

  def oracles: Map[String, String] = Map(
    "mr_teragen" -> genSql,
    "mr_terasort" -> s"SELECT key, value FROM ($genSql) ORDER BY key",
    "mr_terachecksum" ->
      ("SELECT count(*) AS n_records, CAST(sum(cksum) AS BIGINT) AS checksum FROM " +
        "(SELECT CAST(list_sum(list_transform(generate_series(1, 10), " +
        "j -> CAST(strpos('0123456789abcdef', substr(m, CAST(j AS INT), 1)) - 1 AS BIGINT) << ((10 - j) * 4))) AS BIGINT) AS cksum " +
        s"FROM (SELECT md5(key || value) AS m FROM ($genSql)))"),
    "mr_random_binary" ->
      (s"SELECT i AS id, md5(CAST(i AS VARCHAR)) AS key_md5, CAST(100 + i % 900 AS INT) AS value_len " +
        s"FROM generate_series(0, ${RandBinN - 1}) t(i)"))
}
