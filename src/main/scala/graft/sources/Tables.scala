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

  /** ORC — the second columnar container the Hadoop ecosystem ships
    * alongside parquet (hive/ORC lineage); same pushdown + pruning
    * machinery applies (spec-asserted). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** distcp analog (hadoop-tools/hadoop-distcp): bulk, partition-parallel
    * copy with end-to-end verification. Copies a table to `dstDir` as
    * parquet and returns (rows, checksum) of both sides; distcp's CRC check
    * becomes an order-independent content checksum (xor-free: sum of row
    * hashes) computed by the engine itself. */
  def copyVerified(spark: SparkSession, srcDir: String, table: String, dstDir: String): (Long, Long, Long, Long) = {
    import org.apache.spark.sql.functions.{hash, sum, col}
    val src = load(spark, srcDir, table)
    src.write.mode("overwrite").parquet(s"$dstDir/$table")
    val dst = spark.read.parquet(s"$dstDir/$table")
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.select(sum(hash(df.columns.map(col): _*).cast("long")).as("chk"))
        .collect().head
      (df.count(), r.getLong(0))
    }
    val (sn, sc) = sig(src)
    val (dn, dc) = sig(dst)
    (sn, sc, dn, dc)
  }

  /** Object-store configuration passthrough. A real 100 TB corpus lives in
    * object storage; the reference ships cloud connectors as first-class
    * tools (hadoop-tools/hadoop-aws/src/main/java/org/apache/hadoop/fs/s3a/
    * S3AFileSystem.java:77, plus hadoop-azure / hadoop-openstack). Spark
    * reaches ANY Hadoop FileSystem through one conf surface — this applies
    * credential / endpoint / committer settings onto the session's Hadoop
    * conf so bare scheme-qualified paths (`s3a://bucket/corpus`) flow
    * through `load`/`text`/`csv`/`copyUpdate` unchanged:
    *
    *   configureStore(spark, Map(
    *     "fs.s3a.access.key" -> ..., "fs.s3a.secret.key" -> ...,
    *     "fs.s3a.endpoint"   -> ...,
    *     // task-commit without rename — the committer that makes parquet
    *     // writes safe on eventually-renamed object stores
    *     "fs.s3a.committer.name" -> "magic"))
    *
    * The zero-egress test container has no real object store; the spec
    * exercises this plumbing end-to-end with a custom `graftfs://` scheme
    * registered the same way (`fs.<scheme>.impl`), which is exactly how a
    * deployment would wire any store connector. */
  def configureStore(spark: SparkSession, conf: Map[String, String]): Unit =
    conf.foreach { case (k, v) => spark.sparkContext.hadoopConfiguration.set(k, v) }

  /** DistCp `-update` analog (hadoop-tools/hadoop-distcp/.../DistCpOptionSwitch.java:65
    * SYNC_FOLDERS): copy only files MISSING from or CHANGED in the
    * destination — the mode real operators run nightly, where a full
    * re-copy of an unchanged 100 TB corpus is the difference between
    * minutes and a day. A file is unchanged iff (name, size, content-md5)
    * match; both manifests are computed DISTRIBUTED by the binaryFile
    * source (one task per file group, no driver-side streaming), and only
    * the changed-file LIST lands on the driver — the same bounded copy
    * listing DistCp itself materializes. The copies then run as a
    * partition-parallel job. Returns (srcFiles, copied). */
  def copyUpdate(spark: SparkSession, srcDir: String, dstDir: String): (Long, Long) = {
    import org.apache.spark.sql.functions.{col, lit, md5}
    import scala.jdk.CollectionConverters._
    // a sync tool must see CURRENT file state, not the session's cached
    // listing (stale lengths fail the read of any file modified in place)
    spark.catalog.refreshByPath(srcDir)
    spark.catalog.refreshByPath(dstDir)
    // destination existence goes through the Hadoop FS for the path's OWN
    // scheme (configureStore credentials/impls apply) — a java.io probe
    // would break every non-local destination this tool exists to serve
    val hconf = spark.sparkContext.hadoopConfiguration
    // Manifests key on the DIR-RELATIVE path, not the basename: binaryFile
    // recurses into partitioned trees (source=a/part-0...), where basenames
    // collide across subdirs and a $dir/$basename rebuild points nowhere —
    // relative keys make nested syncs converge like flat ones.
    def manifest(dir: String): DataFrame = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val prefix = p.getFileSystem(hconf).makeQualified(p).toString + "/"
      spark.read.format("binaryFile").load(dir)
        .select(col("path").substr(lit(prefix.length + 1), lit(Int.MaxValue)).as("name"),
          col("length"), md5(col("content")).as("chk"))
    }
    val dstPath = new org.apache.hadoop.fs.Path(dstDir)
    val dstFs = dstPath.getFileSystem(hconf)
    val srcM = manifest(srcDir)
    val dstM =
      if (dstFs.exists(dstPath) && dstFs.listStatus(dstPath).nonEmpty) manifest(dstDir)
      else srcM.limit(0)
    val toCopy = srcM.join(dstM, Seq("name", "length", "chk"), "left_anti")
      .select("name").collect().map(_.getString(0)).toSeq
    val nSrc = srcM.count()
    if (toCopy.nonEmpty) {
      // Configuration is not serializable; ship the session's entries as a
      // plain seq so executor-side FileSystems resolve the same schemes,
      // committers and credentials the driver configured.
      val confEntries = hconf.iterator().asScala
        .map(e => e.getKey -> e.getValue).toSeq
      spark.sparkContext
        .parallelize(toCopy, math.min(toCopy.length, 32))
        .foreach { n =>
          val conf = new org.apache.hadoop.conf.Configuration()
          confEntries.foreach { case (k, v) => conf.set(k, v) }
          val sp = new org.apache.hadoop.fs.Path(s"$srcDir/$n")
          val dp = new org.apache.hadoop.fs.Path(s"$dstDir/$n")
          org.apache.hadoop.fs.FileUtil.copy(
            sp.getFileSystem(conf), sp, dp.getFileSystem(conf), dp,
            false, true, conf)
        }
    }
    (nSrc, toCopy.length.toLong)
  }

  /** SequenceFile support — the reference's native binary KV container
    * (examples use SequenceFileInput/OutputFormat throughout). Spark ships
    * the Hadoop I/O classes, so this is real format compatibility, not an
    * analog: files written here are readable by any Hadoop job. */
  def writeSequenceFile(df: DataFrame, keyCol: String, valueCol: String, path: String): Unit = {
    df.select(keyCol, valueCol).rdd
      .map(r => (r.get(0).toString, r.get(1).toString))
      .saveAsSequenceFile(path)
  }

  /** Binary-KV SequenceFile (RandomWriter.java's output shape): raw
    * BytesWritable pairs, readable by any Hadoop job — format parity for
    * the reference's binary variant, alongside the Text pair writer above. */
  def writeSequenceFileBinary(df: DataFrame, keyCol: String, valueCol: String, path: String): Unit = {
    import org.apache.hadoop.io.BytesWritable
    df.select(keyCol, valueCol).rdd
      .map(r => (new BytesWritable(r.getAs[Array[Byte]](0)),
        new BytesWritable(r.getAs[Array[Byte]](1))))
      .saveAsSequenceFile(path)
  }

  def readSequenceFileBinary(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.io.BytesWritable
    val rdd = spark.sparkContext
      .sequenceFile(path, classOf[BytesWritable], classOf[BytesWritable])
      // Hadoop record readers REUSE the writable instances; copy per record
      // before anything downstream can buffer the row.
      .map { case (k, v) => org.apache.spark.sql.Row(k.copyBytes(), v.copyBytes()) }
    spark.createDataFrame(rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.BinaryType))))
  }

  def readSequenceFile(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext
      .sequenceFile[String, String](path)
    spark.createDataFrame(rdd.map(kv => org.apache.spark.sql.Row(kv._1, kv._2)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType))))
  }

  /** MapReduce counters analog: named metrics observed during a single pass
    * (`df.observe`) — collected by the driver without a second action. */
  def observed(df: DataFrame, name: String,
      metrics: Seq[org.apache.spark.sql.Column]): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Hadoop-archives (har) analog: small-file compaction. Reads a table and
    * rewrites it as `numFiles` parquet files — the remedy for the many-small-
    * files pathology har exists to solve, columnar-native. */
  def compact(spark: SparkSession, srcDir: String, table: String, dstDir: String,
      numFiles: Int = 1): Long = {
    val df = load(spark, srcDir, table)
    df.coalesce(numFiles).write.mode("overwrite").parquet(s"$dstDir/$table")
    spark.read.parquet(s"$dstDir/$table").count()
  }

  /** JDBC source/sink (DBInput/DBOutputFormat analog — the reference's
    * DBCountPageView.java reads pageview rows from an SQL database and
    * writes aggregated counts back through DBOutputFormat). Spark-first
    * that's `read.jdbc` / `write.jdbc`; Derby (embedded, ships in Spark's
    * jars directory) stands in for the demo database with no extra
    * dependency. Reads can be partition-parallel: pass a numeric
    * `partitionColumn` and Spark issues one bounded query per partition —
    * the DBInputFormat split model, but with predicate pushdown into the
    * remote SQL (the spec asserts the filter leaves the Spark plan). */
  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** `columnTypes` pins SQL types for string columns ("c VARCHAR(32)") —
    * Derby otherwise maps StringType to CLOB, which SQL can't compare. */
  def jdbcWrite(df: DataFrame, url: String, table: String,
      columnTypes: Option[String] = None): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", DerbyDriver)
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .mode("overwrite").save()
  }

  def jdbcRead(spark: SparkSession, url: String, table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", DerbyDriver)
    partitionColumn.fold(base) { case (colName, lower, upper, n) =>
      base.option("partitionColumn", colName)
        .option("lowerBound", lower).option("upperBound", upper)
        .option("numPartitions", n)
    }.load()
  }
}
