package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, floor, lit, shiftleft, shiftright, when}

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

  /** `events.parquet` has shipped with either TIMESTAMP(NANOS) — which
    * Spark's vectorized parquet reader rejects, so sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and the column arrives as
    * LONG nanos — or plain TIMESTAMP(MICROS), which arrives as a timestamp
    * already. The rebuild is TYPE-driven: a LONG `ts` is nanos and is
    * truncated to a microsecond TIMESTAMP_NTZ (`ts div 1000` — integer
    * division, since nanos since epoch exceed 2^53 and would lose precision
    * through a double; DuckDB truncates nanos→micros the same way); a
    * timestamp `ts` is normalized to TIMESTAMP_NTZ as-is. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    } else df
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

  /** Dir-relative manifest key of a file path, computed STRUCTURALLY: both
    * sides go through Hadoop Path -> URI so percent-escaping and
    * trailing-slash/symlink qualification differences cannot desync the
    * key the way prefix-length string arithmetic could. `base` must be the
    * makeQualified'd directory URI. */
  private def relName(base: java.net.URI, pathStr: String): String = {
    val baseSlash = if (base.getPath.endsWith("/")) base
      else new java.net.URI(base.getScheme, base.getAuthority, base.getPath + "/", null, null)
    val rel = baseSlash.relativize(new org.apache.hadoop.fs.Path(pathStr).toUri)
    require(!rel.isAbsolute, s"$pathStr is not under $base")
    rel.getPath
  }

  /** DistCp `-update` analog (hadoop-tools/hadoop-distcp/.../DistCpOptionSwitch.java:65
    * SYNC_FOLDERS): copy only files MISSING from or CHANGED in the
    * destination — the mode real operators run nightly, where a full
    * re-copy of an unchanged 100 TB corpus is the difference between
    * minutes and a day.
    *
    * The DEFAULT (`verify = true`) matches DistCp's default semantics:
    * same-length files are content-checked before being skipped (DistCp's
    * CopyMapper.canSkip checksums same-length pairs; here: full
    * content-md5 manifests on both sides). `verify = false` is the
    * explicit opt-in degradation — DistCp's `-skipcrccheck` analog: a
    * file is unchanged if (relative name, size) match AND the destination
    * copy is not older than the source (mtime from the same distributed
    * listing — no content read). Same-size files whose destination mtime
    * trails the source's by more than `-mtimeSlackMs` are the ambiguous
    * case — only those few have both sides checksummed (a bounded
    * per-file executor job), so an unchanged nightly re-sync reads ZERO
    * destination bytes (spec-asserted via a counting FileSystem).
    * CALL-SITE HAZARD of the opt-in: a same-size rewrite whose source
    * mtime never advances past the destination copy's silently never
    * syncs, and the mtimes compared come from the two stores' OWN clocks
    * — cheap mode assumes they are roughly synchronized; `mtimeSlackMs`
    * widens the checksummed band to absorb known skew (destination clock
    * ahead by up to the slack no longer masks newer same-size sources).
    *
    * Manifests are computed DISTRIBUTED by the binaryFile source (one task
    * per file group; cheap mode projects ONLY path/length/mtime, so the
    * scan never opens file contents), keyed on the DIR-RELATIVE path
    * (binaryFile recurses into partitioned trees where basenames collide
    * across subdirs); only the changed-file LIST lands on the driver — the
    * same bounded copy listing DistCp itself materializes. The copies then
    * run as a partition-parallel job. Returns (srcFiles, copied). */
  def copyUpdate(spark: SparkSession, srcDir: String, dstDir: String,
      verify: Boolean = true, mtimeSlackMs: Long = 0L): (Long, Long) = {
    import org.apache.spark.sql.functions.{col, md5}
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    // a sync tool must see CURRENT file state, not the session's cached
    // listing (stale lengths fail the read of any file modified in place)
    spark.catalog.refreshByPath(srcDir)
    spark.catalog.refreshByPath(dstDir)
    // destination existence goes through the Hadoop FS for the path's OWN
    // scheme (configureStore credentials/impls apply) — a java.io probe
    // would break every non-local destination this tool exists to serve
    val hconf = spark.sparkContext.hadoopConfiguration
    // Configuration is not serializable; ship the session's entries as a
    // plain (eager — a lazy here would drag hconf into the closure) seq so
    // executor-side FileSystems resolve the same schemes, committers and
    // credentials the driver configured.
    val confEntries: Seq[(String, String)] = hconf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toSeq
    val execConf: () => org.apache.hadoop.conf.Configuration = () => {
      val conf = new org.apache.hadoop.conf.Configuration()
      confEntries.foreach { case (k, v) => conf.set(k, v) }
      conf
    }
    def baseUri(dir: String): java.net.URI = {
      val p = new Path(dir)
      p.getFileSystem(hconf).makeQualified(p).toUri
    }
    def manifest(dir: String): DataFrame = {
      val base = baseUri(dir)
      val m = spark.read.format("binaryFile").load(dir)
      val named = (if (verify)
        m.select(col("path"), col("length"), md5(col("content")).as("chk"))
      else
        // content column NOT projected -> the scan lists, never opens
        // millisecond mtime (a bare long cast truncates to seconds and
        // would blur a modify-right-after-copy into "not older")
        m.select(col("path"), col("length"),
          (col("modificationTime").cast("double") * 1000).cast("long").as("mt")))
      val rel = org.apache.spark.sql.functions.udf((p: String) => relName(base, p))
      named.withColumn("name", rel(col("path"))).drop("path")
    }
    val dstPath = new Path(dstDir)
    val dstFs = dstPath.getFileSystem(hconf)
    val srcM = manifest(srcDir)
    val dstM =
      if (dstFs.exists(dstPath) && dstFs.listStatus(dstPath).nonEmpty) manifest(dstDir)
      else srcM.limit(0)
    val toCopy: Seq[String] =
      if (verify) {
        srcM.join(dstM, Seq("name", "length", "chk"), "left_anti")
          .select("name").collect().map(_.getString(0)).toSeq
      } else {
        // ONE distributed classification pass over the manifest join (no
        // second scan); only the (bounded) copy-candidate list — definite
        // changes plus the ambiguous few — lands on the driver
        val definite = col("dlen").isNull || col("dlen") =!= col("length")
        val stale = col("dmt") < col("mt") + org.apache.spark.sql.functions.lit(mtimeSlackMs)
        val candidates = srcM.as("s")
          .join(dstM.select(col("name"), col("length").as("dlen"), col("mt").as("dmt")),
            Seq("name"), "left")
          .filter(definite || stale)
          .select(col("name"), definite.as("def"))
          .collect()
        val changed = candidates.filter(_.getBoolean(1)).map(_.getString(0))
        // same size, stale destination mtime: checksum ON DEMAND, only these
        val ambiguous = candidates.filterNot(_.getBoolean(1)).map(_.getString(0))
        val confirmed: Seq[String] = if (ambiguous.isEmpty) Seq.empty else {
          val (srcD, dstD) = (srcDir, dstDir)
          spark.sparkContext
            .parallelize(ambiguous.toSeq, math.min(ambiguous.length, 32))
            .flatMap { n =>
              val conf = execConf()
              def sum(p: Path): Seq[Byte] = {
                val md = java.security.MessageDigest.getInstance("MD5")
                val in = p.getFileSystem(conf).open(p)
                try {
                  val buf = new Array[Byte](65536)
                  var r = in.read(buf)
                  while (r > 0) { md.update(buf, 0, r); r = in.read(buf) }
                } finally in.close()
                md.digest().toSeq
              }
              if (sum(new Path(s"$srcD/$n")) == sum(new Path(s"$dstD/$n"))) None else Some(n)
            }.collect().toSeq
        }
        changed.toSeq ++ confirmed
      }
    val nSrc = srcM.count()
    if (toCopy.nonEmpty) {
      spark.sparkContext
        .parallelize(toCopy, math.min(toCopy.length, 32))
        .foreach { n =>
          val conf = execConf()
          val sp = new Path(s"$srcDir/$n")
          val dp = new Path(s"$dstDir/$n")
          org.apache.hadoop.fs.FileUtil.copy(
            sp.getFileSystem(conf), sp, dp.getFileSystem(conf), dp,
            false, true, conf)
        }
    }
    (nSrc, toCopy.length.toLong)
  }

  /** Z-ORDER clustered write — multi-dimensional data skipping for the
    * 100 TB table layout (the Delta/Iceberg OPTIMIZE ZORDER recipe,
    * expressed with plain Spark): both columns normalize to a 16-bit grid
    * (one tiny min/max aggregate — deterministic bounds, not a sample),
    * their bits interleave into a Morton key, and the write
    * range-partitions + sorts on that key. Files then occupy compact
    * rectangles of the 2-D value space, so a reader consulting per-file
    * min/max (parquet footers / table-format stats) prunes on EITHER
    * predicate column — a single-column sort gives skipping on that column
    * only. The key is layout-only: dropped before write, row content
    * untouched. */
  def zorderKey(a: Column, b: Column): Column = {
    def bits16(c: Column): Column = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val (na, nb) = (bits16(a), bits16(b))
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(na, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(nb, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** Scale `c` into [0, 65535] against inclusive bounds (rank-free grid). */
  def gridScale(c: Column, lo: Double, hi: Double): Column =
    when(lit(hi) > lit(lo),
      floor((c.cast("double") - lit(lo)) / (lit(hi) - lit(lo)) * 65535.0))
      .otherwise(lit(0L)).cast("long")

  def zorderWrite(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int): Unit = {
    val b = df.agg(
      org.apache.spark.sql.functions.min(col(colA)).cast("double"),
      org.apache.spark.sql.functions.max(col(colA)).cast("double"),
      org.apache.spark.sql.functions.min(col(colB)).cast("double"),
      org.apache.spark.sql.functions.max(col(colB)).cast("double")).head()
    val z = zorderKey(
      gridScale(col(colA), b.getDouble(0), b.getDouble(1)),
      gridScale(col(colB), b.getDouble(2), b.getDouble(3)))
    df.withColumn("_zkey", z)
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
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
