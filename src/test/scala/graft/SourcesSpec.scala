package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

class SourcesSpec extends SparkSpec {

  test("distcp-analog copy preserves rows and content checksum") {
    val dst = Files.createTempDirectory("graft_distcp").toString
    val (sn, sc, dn, dc) = Tables.copyVerified(spark, sf, "events", dst)
    assert(sn == dn, "row count changed in copy")
    assert(sc == dc, "content checksum changed in copy")
  }

  test("compact (har analog) rewrites to fewer files, preserving rows") {
    val dst = Files.createTempDirectory("graft_compact").toString
    val n = Tables.compact(spark, sf, "events", dst, numFiles = 1)
    assert(n == Tables.load(spark, sf, "events").count())
    val files = new java.io.File(s"$dst/events").listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"expected 1 parquet file, got $files")
  }

  test("z-order write clusters both dimensions: a 2-D box prunes most files") {
    val dst = Files.createTempDirectory("graft_zorder").toString + "/events_z"
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    Tables.zorderWrite(ev, "user_id", "value", dst, nFiles = 16)
    val back = spark.read.parquet(dst)
    assert(back.count() == ev.count(), "z-order write must preserve rows")
    // Per-file bounding boxes — what parquet footer stats / a table format
    // would serve a pruning reader.
    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("value").as("vlo"), max("value").as("vhi"))
      .collect()
    // query box: middle slice of each dimension
    val st = ev.agg(
      expr("approx_percentile(user_id, array(0.4, 0.6))"),
      expr("approx_percentile(value, array(0.4, 0.6))")).head()
    val u = st.getSeq[Long](0); val v = st.getSeq[Double](1)
    def hits(bs: Array[org.apache.spark.sql.Row]) = bs.count { r =>
      r.getLong(1) <= u(1) && r.getLong(2) >= u(0) &&
        r.getDouble(3) <= v(1) && r.getDouble(4) >= v(0)
    }
    val zHits = hits(boxes(dst))
    val zFiles = boxes(dst).length
    // baseline: same data in arrival order (event_id) — user/value scatter
    // across every file, so the same box intersects (nearly) all of them
    val flat = Files.createTempDirectory("graft_flat").toString + "/events_f"
    ev.repartitionByRange(16, col("event_id")).write.parquet(flat)
    val fHits = hits(boxes(flat))
    assert(zFiles >= 8, s"expected ~16 z-ordered files, got $zFiles")
    assert(fHits >= zFiles - 2, s"arrival-order layout should not prune: $fHits")
    assert(zHits * 2 <= fHits,
      s"z-order must at least halve the touched files: z=$zHits flat=$fHits of $zFiles")
  }

  test("gzip text round-trips transparently (TextInputFormat codec parity)") {
    // The reference's TextInputFormat decompresses .gz splits transparently
    // (hadoop-common GzipCodec); Spark's text/csv readers inherit the same
    // Hadoop codec wiring — this pins the round-trip so a source-layer
    // refactor can't lose it.
    val dst = Files.createTempDirectory("graft_gzip").toString
    val src = Tables.load(spark, sf, "documents").select(col("text"))
    src.write.option("compression", "gzip").mode("overwrite").text(s"$dst/docs")
    val gzFiles = new java.io.File(s"$dst/docs").listFiles().count(_.getName.endsWith(".txt.gz"))
    assert(gzFiles > 0, "writer did not produce gzip members")
    val back = Tables.text(spark, s"$dst/docs")
    assert(back.count() == src.count())
    def sig(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(hash(col(df.columns.head)).cast("long"))).collect().head.getLong(0)
    assert(sig(back) == sig(src), "line content changed through the gzip round-trip")
  }

  test("bzip2 text is splittable: one compressed file scans as multiple partitions") {
    // gzip round-trips (above) but is NOT splittable — one 100 GB .gz text
    // file is ONE task. The reference's bzip2 path is splittable
    // (hadoop-common/.../io/compress/BZip2Codec.java:58 implements
    // SplittableCompressionCodec); Spark's text reader inherits the same
    // codec wiring, so a single .bz2 file must scan as >1 partition.
    val dst = Files.createTempDirectory("graft_bzip2").toString
    val src = Tables.load(spark, sf, "documents").select(col("text"))
    src.coalesce(1).write.option("compression", "bzip2").text(s"$dst/docs")
    val bz = new java.io.File(s"$dst/docs").listFiles().filter(_.getName.endsWith(".txt.bz2"))
    assert(bz.length == 1, "writer should produce exactly one bzip2 member")
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    // size splits to a quarter of the compressed file: a splittable codec
    // yields ~4 partitions; an unsplittable one would stay at 1
    spark.conf.set("spark.sql.files.maxPartitionBytes", (bz.head.length() / 4 + 1).toString)
    try {
      val back = Tables.text(spark, s"$dst/docs")
      val parts = back.rdd.getNumPartitions
      assert(parts > 1, s"bzip2 file did not split: $parts partition(s)")
      def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) =
        (df.count(),
          df.select(sum(hash(col(df.columns.head)).cast("long"))).collect().head.getLong(0))
      assert(sig(back) == sig(src), "content changed through the split bzip2 scan")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("object-store plumbing: a non-default scheme reads/writes through Tables") {
    // No egress in the container, so the connector is a local-backed FS under
    // a foreign scheme — the resolution path (fs.<scheme>.impl off the
    // session Hadoop conf) is the one s3a:// uses; see Tables.configureStore.
    Tables.configureStore(spark, Map(
      "fs.graftfs.impl" -> classOf[SchemeTestFs].getName,
      // committer/credential keys ride the same channel (inert here)
      "fs.graftfs.committer.name" -> "magic"))
    assert(spark.sparkContext.hadoopConfiguration.get("fs.graftfs.committer.name") == "magic")
    val dir = Files.createTempDirectory("graft_scheme").toString
    val src = Tables.load(spark, sf, "nation")
    src.write.mode("overwrite").parquet(s"graftfs://$dir/nation.parquet")
    assert(new java.io.File(s"$dir/nation.parquet").exists(),
      "write did not land through the scheme-registered filesystem")
    val back = Tables.load(spark, s"graftfs://$dir", "nation")
    assert(back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq ==
      src.orderBy("n_nationkey").collect().map(_.toSeq).toSeq)
  }

  test("distcp -update copies only missing/changed files; unchanged re-run copies zero") {
    val srcD = Files.createTempDirectory("graft_upd_src").toString
    val dstD = Files.createTempDirectory("graft_upd_dst").toString
    Tables.load(spark, sf, "nation").repartition(4).write.mode("overwrite").parquet(srcD)
    val (n1, c1) = Tables.copyUpdate(spark, srcD, dstD)
    assert(c1 == n1 && c1 > 0, s"first pass must copy every file ($c1 of $n1)")
    // second pass over identical trees: the -update contract — zero copies
    val (_, c2) = Tables.copyUpdate(spark, srcD, dstD)
    assert(c2 == 0, s"unchanged re-run copied $c2 files")
    // change exactly one file's bytes: exactly one re-copy
    val part = new java.io.File(srcD).listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.write(part.toPath, "delta".getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    // the out-of-band append invalidates Hadoop's local-FS .crc sidecar;
    // drop it (a real object store has no such sidecar)
    new java.io.File(srcD, s".${part.getName}.crc").delete()
    val (_, c3) = Tables.copyUpdate(spark, srcD, dstD)
    assert(c3 == 1, s"one changed file should mean one copy, got $c3")
    // destination bytes now mirror the source exactly
    def m(d: String) = spark.read.format("binaryFile").load(d)
      .select(regexp_extract(col("path"), "[^/]+$", 0), col("length"), md5(col("content")))
      .collect().map(_.toSeq).toSet
    assert(m(dstD) == m(srcD), "post-update destination diverges from source")
  }

  test("distcp -update syncs a nested partitioned tree (relative-path manifest keys)") {
    // Partitioned layouts nest files under key=value dirs where basenames
    // collide across subdirs; the manifest must key on dir-relative paths
    // for the sync to land files in place and converge.
    val srcD = Files.createTempDirectory("graft_upd3_src").toString
    val dstD = Files.createTempDirectory("graft_upd3_dst").toString
    Tables.load(spark, sf, "documents")
      .write.partitionBy("source").mode("overwrite").parquet(srcD)
    val (n1, c1) = Tables.copyUpdate(spark, srcD, dstD)
    assert(c1 == n1 && c1 > 0, s"first pass must copy every nested file ($c1 of $n1)")
    val (_, c2) = Tables.copyUpdate(spark, srcD, dstD)
    assert(c2 == 0, s"unchanged nested re-run copied $c2 files")
    // the synced tree reads back as the same partitioned table
    assert(spark.read.parquet(dstD).count() ==
      Tables.load(spark, sf, "documents").count())
    assert(new java.io.File(dstD).listFiles().exists(_.getName.startsWith("source=")),
      "partition directories were not reproduced at the destination")
  }

  test("distcp -update syncs onto a non-default scheme destination") {
    // the object-store composition: configureStore registers the scheme,
    // copyUpdate resolves existence AND executor-side copies through it
    Tables.configureStore(spark, Map("fs.graftfs.impl" -> classOf[SchemeTestFs].getName))
    val srcD = Files.createTempDirectory("graft_upd2_src").toString
    val dstLocal = Files.createTempDirectory("graft_upd2_dst").toString + "/synced"
    val dstD = s"graftfs://$dstLocal"
    Tables.load(spark, sf, "region").repartition(2).write.mode("overwrite").parquet(srcD)
    val (n1, c1) = Tables.copyUpdate(spark, srcD, dstD)
    assert(c1 == n1 && c1 > 0, s"first pass must copy every file ($c1 of $n1)")
    assert(new java.io.File(dstLocal).listFiles().nonEmpty,
      "copies did not land through the scheme-registered filesystem")
    val (_, c2) = Tables.copyUpdate(spark, srcD, dstD)
    assert(c2 == 0, s"unchanged re-run copied $c2 files across the scheme")
  }

  test("distcp -update cheap mode reads zero destination contents when unchanged; checksums only ambiguity") {
    // verify=false is the EXPLICIT opt-in (DistCp -skipcrccheck analog) —
    // an unchanged nightly re-sync must not OPEN a single destination file
    // (size+mtime from the listing decide), and a same-size content change
    // with a stale destination mtime is the one case that checksums (only
    // those files), then copies.
    Tables.configureStore(spark, Map("fs.graftfs.impl" -> classOf[SchemeTestFs].getName))
    val srcD = Files.createTempDirectory("graft_upd5_src").toString
    val dstLocal = Files.createTempDirectory("graft_upd5_dst").toString + "/synced"
    val dstD = s"graftfs://$dstLocal"
    new java.io.File(srcD, "a.txt").toPath.toFile.getParentFile.mkdirs()
    java.nio.file.Files.write(new java.io.File(srcD, "a.txt").toPath, "alpha-one".getBytes)
    java.nio.file.Files.write(new java.io.File(srcD, "b.txt").toPath, "beta-file".getBytes)
    val (n1, c1) = Tables.copyUpdate(spark, srcD, dstD, verify = false)
    assert(c1 == n1 && c1 == 2, s"first pass must copy both files ($c1 of $n1)")
    // unchanged re-sync: zero copies AND zero destination content reads
    SchemeTestFs.opens.set(0)
    val (_, c2) = Tables.copyUpdate(spark, srcD, dstD, verify = false)
    assert(c2 == 0, s"unchanged re-run copied $c2 files")
    assert(SchemeTestFs.opens.get() == 0,
      s"cheap re-sync opened ${SchemeTestFs.opens.get()} destination files (must list only)")
    // same-size content change, source mtime bumped PAST the copy: the
    // ambiguous case — checksum confirms the change and exactly one copies
    java.nio.file.Files.write(new java.io.File(srcD, "a.txt").toPath, "alpha-two".getBytes)
    val aPath = new org.apache.hadoop.fs.Path(s"$srcD/a.txt")
    aPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .setTimes(aPath, System.currentTimeMillis() + 60000, -1)
    SchemeTestFs.opens.set(0)
    val (_, c3) = Tables.copyUpdate(spark, srcD, dstD, verify = false)
    assert(c3 == 1, s"one same-size change should mean one copy, got $c3")
    // the checksum probe touched only the ambiguous file's destination
    // copy, plus that file's re-copy overwrite machinery — never b.txt
    assert(spark.read.textFile(s"$dstD/a.txt").collect().toSeq == Seq("alpha-two"),
      "ambiguous file's new bytes did not land")
    // the documented opt-in hazard: cheap mode skips a same-size rewrite
    // with a rewound mtime; the DEFAULT (verify=true, DistCp-parity
    // content manifests) catches it
    java.nio.file.Files.write(new java.io.File(srcD, "b.txt").toPath, "beta-eile".getBytes)
    val bPath = new org.apache.hadoop.fs.Path(s"$srcD/b.txt")
    bPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .setTimes(bPath, System.currentTimeMillis() - 3600000, -1)
    val (_, c4) = Tables.copyUpdate(spark, srcD, dstD, verify = false)
    assert(c4 == 0, "cheap mode by design skips a same-size rewrite with a rewound mtime")
    val (_, c5) = Tables.copyUpdate(spark, srcD, dstD)
    assert(c5 == 1, s"the default must checksum-catch the rewound rewrite, got $c5")
  }

  test("distcp -update cheap-mode mtime slack absorbs store clock skew") {
    // Destination clock ahead of the source's: a genuinely newer same-size
    // source file carries an mtime BEHIND its destination copy, which bare
    // cheap mode must miss (dmt >= mt) and a slack window must checksum.
    val srcD = Files.createTempDirectory("graft_upd6_src").toString
    val dstD = Files.createTempDirectory("graft_upd6_dst").toString + "/synced"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcD))
    java.nio.file.Files.write(new java.io.File(srcD, "c.txt").toPath, "clock-one".getBytes)
    val (_, c1) = Tables.copyUpdate(spark, srcD, dstD, verify = false)
    assert(c1 == 1)
    // same-size rewrite whose mtime lands BEFORE the destination copy's
    // (the skewed-source-clock shape)
    java.nio.file.Files.write(new java.io.File(srcD, "c.txt").toPath, "clock-two".getBytes)
    val cPath = new org.apache.hadoop.fs.Path(s"$srcD/c.txt")
    cPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .setTimes(cPath, System.currentTimeMillis() - 30000, -1)
    val (_, c2) = Tables.copyUpdate(spark, srcD, dstD, verify = false)
    assert(c2 == 0, "without slack the skewed rewrite is invisible (documented trade)")
    val (_, c3) = Tables.copyUpdate(spark, srcD, dstD, verify = false, mtimeSlackMs = 3600000)
    assert(c3 == 1, s"a one-hour slack must checksum-catch the skewed rewrite, got $c3")
    assert(spark.read.textFile(s"$dstD/c.txt").collect().toSeq == Seq("clock-two"))
  }

  test("partitioned parquet write prunes to one directory on a partition-key filter") {
    import org.apache.spark.sql.functions._
    val dst = Files.createTempDirectory("graft_part").toString
    Tables.load(spark, sf, "documents")
      .write.partitionBy("source").mode("overwrite").parquet(s"$dst/docs")
    val back = spark.read.parquet(s"$dst/docs").filter(col("source") === "src3")
    val plan = back.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters"), s"no partition filter in scan:\n$plan")
    // collect() runs THIS DataFrame's query execution, populating its scan
    // metrics (count() would build a separate execution).
    assert(back.collect().length.toLong ==
      Tables.load(spark, sf, "documents").filter(col("source") === "src3").count())
    // The scan metric (post-pruning) must see only src3's files — 1 of the
    // 20 partition directories. (df.inputFiles is pre-pruning; don't use it.)
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = new java.io.File(s"$dst/docs").listFiles()
      .filter(_.getName.startsWith("source=")).map(_.listFiles()
        .count(_.getName.endsWith(".parquet"))).sum
    assert(filesRead < totalFiles && filesRead > 0,
      s"partition pruning read $filesRead of $totalFiles files")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // The 100 TB complement of static pruning: when the partition keys to
    // read are only known from a JOIN (dim filter), Spark injects a runtime
    // subquery into the fact scan's PartitionFilters — unread partitions
    // are skipped entirely. Static pruning (spec above) covers literal
    // predicates; this proves the join-driven case a star-schema workload
    // actually hits.
    val dst = Files.createTempDirectory("graft_dpp").toString
    Tables.load(spark, sf, "documents")
      .write.partitionBy("source").mode("overwrite").parquet(s"$dst/fact")
    val s = spark
    import s.implicits._
    // The dim must be a REAL source, not a local Seq: ConvertToLocalRelation
    // folds a filter over a local relation away, and with no Filter node the
    // pruning side has no selective predicate for DPP to key off.
    Seq(("src3", "keep"), ("src7", "keep"), ("src9", "drop"))
      .toDF("source", "tag").write.mode("overwrite").parquet(s"$dst/dim")
    val dim = spark.read.parquet(s"$dst/dim")
    val joined = spark.read.parquet(s"$dst/fact")
      .join(dim.filter(col("tag") === "keep"), Seq("source"))
    val rows = joined.collect().length.toLong
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no runtime partition pruning subquery in the fact scan:\n$plan")
    assert(rows == Tables.load(spark, sf, "documents")
      .filter(col("source").isin("src3", "src7")).count())
  }

  test("runtime bloom filter prunes the probe side of a shuffle join") {
    // Fact-fact joins can't broadcast; Spark's runtime row-level filtering
    // builds a bloom filter from the selective side and pushes
    // might_contain onto the probe side's scan — at 100 TB that drops the
    // shuffled volume to ~the matching keys. Thresholds are sized for real
    // clusters (probe side >= 10 GB), so lower them to prove the wiring.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val li = Tables.load(spark, sf, "lineitem")
      val o = Tables.load(spark, sf, "orders").filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("might_contain") || plan.contains("bloomfilter"),
        s"no runtime bloom filter on the probe side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("JDBC source/sink round-trips a DBCountPageView-shaped pipeline through Derby") {
    import org.apache.spark.sql.functions._
    val url = s"jdbc:derby:${Files.createTempDirectory("graft_derby")}/db;create=true"
    // Sink: load the pageview-shaped rows into the database.
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    Tables.jdbcWrite(ev, url, "pageviews", Some("event_type VARCHAR(32)"))
    // Source: partition-parallel read (DBInputFormat's split model) with a
    // predicate that must reach the remote SQL, not the Spark plan.
    val maxId = ev.agg(max("event_id")).collect().head.getLong(0)
    val back = Tables.jdbcRead(spark, url, "pageviews",
      Some(("event_id", 0L, maxId + 1, 4)))
    assert(back.rdd.getNumPartitions == 4, "JDBC read not partition-parallel")
    val filtered = back.filter(col("event_type") === "view")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_type"),
      s"predicate not pushed into the JDBC scan:\n$plan")
    val expected = ev.filter(col("event_type") === "view").count()
    assert(filtered.count() == expected)
    // DBOutputFormat analog: write the aggregate back to a second table.
    val counts = back.groupBy("event_type").agg(count(lit(1)).as("n"))
    Tables.jdbcWrite(counts, url, "pageview_counts", Some("event_type VARCHAR(32)"))
    val persisted = Tables.jdbcRead(spark, url, "pageview_counts")
    assert(persisted.count() == counts.count())
  }

  test("sequence files round-trip through real Hadoop I/O") {
    val dir = Files.createTempDirectory("graft_seq").toString + "/wc"
    val wc = graft.operators.MapReduce.wordcount(spark, sf)
    Tables.writeSequenceFile(wc, "word", "cnt", dir)
    val back = Tables.readSequenceFile(spark, dir)
    val a = wc.collect().map(r => (r.getString(0), r.getLong(1).toString)).toSet
    val b = back.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("small files combine into few scan partitions (CombineFileInputFormat analog)") {
    val dir = Files.createTempDirectory("graft_small").toString + "/n"
    Tables.load(spark, sf, "lineitem").repartition(20).write.parquet(dir)
    val scanned = spark.read.parquet(dir)
    val parts = scanned.rdd.getNumPartitions
    assert(parts < 20, s"expected small files packed into few partitions, got $parts")
    assert(scanned.count() == Tables.load(spark, sf, "lineitem").count())
  }

  test("observe collects counters in a single pass (MapReduce counters analog)") {
    import org.apache.spark.sql.functions._
    val (df, obs) = Tables.observed(Tables.load(spark, sf, "events"), "ev_metrics",
      Seq(count(lit(1)).as("n"), sum(col("value")).as("v"),
        count(when(col("event_type") === "error", 1)).as("errors")))
    val n = df.count()
    val row = obs.get
    assert(row("n") == n)
    assert(row("errors").asInstanceOf[Long] > 0)
  }

  test("bucketed tables co-locate: join on the bucket key plans without a shuffle") {
    val wh = Files.createTempDirectory("graft_buckets").toString
    val o = Tables.load(spark, sf, "orders")
    val c = Tables.load(spark, sf, "customer")
    o.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").mode("overwrite").saveAsTable("b_orders")
    c.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").mode("overwrite").saveAsTable("b_customer")
    try {
      val joined = spark.table("b_orders").hint("merge")
        .join(spark.table("b_customer"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join should not shuffle:\n$p")
      assert(joined.count() == o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("sharded write: partitioned, sorted, size-bounded output files round-trip") {
    // The writer-side execution of pipeline_shard's manifest: partitioned
    // directories, bounded file sizes (maxRecordsPerFile — MultipleOutputs
    // + mapreduce.output.*.maxsize territory in the reference), rows intact.
    val dst = Files.createTempDirectory("graft_shardw").toString + "/docs"
    val src = Tables.load(spark, sf, "documents")
    src.sortWithinPartitions("doc_id")
      .write.partitionBy("source")
      .option("maxRecordsPerFile", "40")
      .mode("overwrite").parquet(dst)
    val back = spark.read.parquet(dst)
    assert(back.count() == src.count())
    val files = new java.io.File(dst).listFiles().filter(_.getName.startsWith("source="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 40, s"${f.getName}: $n rows exceeds maxRecordsPerFile")
    }
  }

  test("FFD writer: one file per bin, oversize partitioned out, layout matches the manifest") {
    import graft.operators.Pipeline
    val dst = Files.createTempDirectory("graft_ffdw").toString + "/packed"
    Pipeline.writeFfdPack(spark, sf, dst)
    // partition-dir columns infer as int — normalize to the manifest types
    val back = spark.read.parquet(dst)
      .withColumn("bin_id", col("bin_id").cast("long"))
      .withColumn("oversize", col("oversize").cast("int"))
    val src = Tables.load(spark, sf, "documents")
    // round-trip: every document exactly once, content intact
    assert(back.count() == src.count())
    assert(back.select("doc_id").distinct().count() == src.count())
    // manifest parity: the written (source, bin_id) groups carry exactly
    // the doc counts and oversize flags pipeline_pack_ffd reports
    val manifest = Pipeline.packFfd(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(5)))).toMap
    val written = back.groupBy(col("source"), col("bin_id"), col("oversize"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(3), r.getInt(2)))).toMap
    assert(written == manifest,
      s"written layout diverges from the manifest (${written.size} vs ${manifest.size} bins)")
    // one output group per bin: each (source, oversize, bin_id) directory
    // holds EXACTLY ONE data file — the training-shard contract
    val binDirs = new java.io.File(dst).listFiles().filter(_.getName.startsWith("source="))
      .flatMap(_.listFiles()).filter(_.getName.startsWith("oversize="))
      .flatMap(_.listFiles()).filter(_.getName.startsWith("bin_id="))
    assert(binDirs.length == manifest.size, s"${binDirs.length} bin dirs vs ${manifest.size} bins")
    binDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files, want exactly 1")
    }
    // oversize discipline: an oversize bin is a single over-context doc;
    // every regular bin fits the context
    val toks = back.withColumn("n_tok", graft.operators.Pipeline.wsTokenCount)
      .groupBy(col("source"), col("bin_id"), col("oversize"))
      .agg(count(lit(1)).as("n"), sum(col("n_tok")).as("t")).collect()
    toks.foreach { r =>
      val (bin, ovr, n, t) = (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4))
      if (ovr == 1)
        assert(n == 1L && t > Pipeline.CtxTokens,
          s"oversize bin ${r.getString(0)}/$bin is not a single over-context doc: n=$n t=$t")
      else assert(t <= Pipeline.CtxTokens,
        s"regular bin ${r.getString(0)}/$bin exceeds the context: $t")
    }
    assert(toks.exists(_.getInt(2) == 0) , "corpus must exercise regular bins")
  }

  test("csv round-trip (TextOutputFormat analog) preserves values") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/nation"
    val src = Tables.load(spark, sf, "nation")
    src.write.option("header", "true").csv(dir)
    val back = Tables.csv(spark, dir)
    assert(back.count() == src.count())
    val a = src.orderBy("n_nationkey").collect().map(_.toSeq.map(String.valueOf)).toSeq
    val b = back.orderBy("n_nationkey").collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(a == b)
  }

  test("orc round-trip preserves values and pushes filters into the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/orders"
    val src = Tables.load(spark, sf, "orders")
    src.write.orc(dir)
    val back = Tables.orc(spark, dir)
    assert(back.count() == src.count())
    val q = back.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey", "o_totalprice")
    val p = q.queryExecution.executedPlan.toString
    // Same scan-side machinery as parquet: predicate pushdown + column pruning.
    assert(p.contains("PushedFilters: [") && p.contains("o_orderpriority"),
      s"filter not pushed to the ORC scan:\n$p")
    assert(q.count() == src.filter(col("o_orderpriority") === "1-URGENT").count())
  }

  test("json round-trip preserves values") {
    val dir = Files.createTempDirectory("graft_json").toString + "/region"
    val src = Tables.load(spark, sf, "region")
    src.write.json(dir)
    val back = Tables.json(spark, dir).select("r_regionkey", "r_name")
    assert(back.orderBy("r_regionkey").collect().map(_.toSeq).toSeq ==
      src.orderBy("r_regionkey").collect().map(_.toSeq).toSeq)
  }
}
