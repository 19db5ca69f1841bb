package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Source layer: every query reads through here so scan behavior is uniform.
  *
  * The reference reads via MapReduce InputFormats (TextInputFormat,
  * KeyValueTextInputFormat, SequenceFileInputFormat, CombineFileInputFormat —
  * see hadoop-mapreduce-project/.../examples/MultiFileWordCount.java for the
  * combine-file path). Spark-first, those all collapse into format readers
  * whose scans Catalyst can prune and push filters into; parquet is the
  * columnar default. `spark.sql.files.maxPartitionBytes` (128 MB default)
  * gives ~8 tasks/GB — at 100 TB that is ~800k tasks, which a 1000-executor
  * cluster drains without driver pressure.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's vectorized
    * parquet reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader restores a
    * microsecond TIMESTAMP_NTZ (`ts div 1000` — integer division, since nanos
    * since epoch exceed 2^53 and would lose precision through a double).
    * DuckDB truncates nanos→micros the same way, so oracles line up. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else df
  }

  /** TextInputFormat analog: one string column per line. */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** CSV / JSON round-trip (TextOutputFormat / KeyValueTextInputFormat analog). */
  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
