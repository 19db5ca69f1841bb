package graft

import graft.operators._

/** Guards the scale-critical physical-plan properties (SURVEY §5): if a
  * refactor un-pushes a filter, drops a broadcast, or turns top-k into a
  * global sort, this suite goes red — the 100 TB contract, enforced at
  * sf0.001. */
class PlansSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("wordcount aggregates partially before the shuffle (the combiner, for free)") {
    val p = plan(MapReduce.wordcount(spark, sf))
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"expected partial+final aggregate (combiner), got $aggs:\n$p")
    assert(p.indexOf("HashAggregate") < p.indexOf("Exchange") ||
      p.lastIndexOf("HashAggregate") > p.indexOf("Exchange"),
      "no map-side aggregate before the exchange")
  }

  test("pricing summary pushes the shipdate filter into the parquet scan") {
    val p = plan(Analytics.pricingSummary(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("pricing summary prunes the scan to referenced columns only") {
    val p = plan(Analytics.pricingSummary(spark, sf))
    assert(!p.contains("l_orderkey"), "scan reads join keys the query never uses")
    assert(!p.contains("l_linenumber"), "scan not pruned")
  }

  test("map-side join broadcasts both dimension tables") {
    val p = plan(MapReduce.joinMapSide(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("shipping priority pushes the segment filter to the customer scan") {
    val p = plan(Analytics.shippingPriority(spark, sf))
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(MapReduce.topK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("text operators are shuffle-free single-pass pipelines") {
    Seq(TextOps.langid(spark, sf), TextOps.quality(spark, sf),
      TextOps.tokens(spark, sf), TextOps.fingerprint(spark, sf),
      TextOps.repetition(spark, sf), TextOps.pii(spark, sf),
      TextOps.piiRedact(spark, sf), TextOps.gopherRules(spark, sf),
      TextOps.bpeEncode(spark, sf), TextOps.bpeIds(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("Exchange"), s"unexpected shuffle in text op:\n$p")
    }
  }

  test("shuffle rank is two-level: block windows only, no range sampling, no global doc window") {
    val p = plan(graft.operators.Pipeline.shuffle(spark, sf))
    assert(!p.contains("rangepartitioning"),
      s"shuffle must not rely on sampled range bounds:\n$p")
    assert(p.contains("windowspecdefinition(blk#"),
      s"local rank must partition by the hash block:\n$p")
    // The only unpartitioned window is the block-histogram cumulation —
    // it must sit above an aggregate, never over the raw doc relation.
    val rawGlobalWindow = p.linesIterator.exists(l =>
      l.contains("windowspecdefinition(h#") || l.contains("windowspecdefinition(doc_id#"))
    assert(!rawGlobalWindow, s"global window over raw docs:\n$p")
  }

  test("curriculum rank keeps the two-level shape: tiered block windows, no raw doc window") {
    val p = plan(graft.operators.Pipeline.curriculum(spark, sf))
    assert(!p.contains("rangepartitioning"),
      s"curriculum must not rely on sampled range bounds:\n$p")
    assert(p.contains("windowspecdefinition(tier#"),
      s"local rank must partition by (tier, blk):\n$p")
    val rawGlobalWindow = p.linesIterator.exists(l =>
      l.contains("windowspecdefinition(h#") || l.contains("windowspecdefinition(doc_id#"))
    assert(!rawGlobalWindow, s"global window over raw docs:\n$p")
  }

  test("equi-depth deciles never globally sort the fact table") {
    val p = plan(graft.operators.Analytics.equidepthHist(spark, sf))
    assert(!p.contains("rangepartitioning"),
      s"no global sort / sampled range bounds over lineitem:\n$p")
    assert(p.contains("windowspecdefinition(blk#"),
      s"cumulative counts must partition by the value block:\n$p")
    // the value-domain aggregate must partial-aggregate before its shuffle
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"value histogram must map-side combine:\n$p")
  }

  test("stratified sample plans through TopKPerKey heaps, no cluster-keyed row window") {
    val p = plan(graft.operators.Pipeline.sampleStratified(spark, sf))
    assert(p.contains("TopKPerKey"),
      s"per-cluster cap must run in the bounded-heap operator:\n$p")
    // The only window allowed is the assignment argmax (partitioned by
    // vec_id); a Window node over the CLUSTER key would buffer the densest
    // cluster on one task — the exact plan the operator exists to avoid.
    // (the assignment argmax window partitions by vec_id and only
    // tie-breaks on cent_id — the partition key is windowspecdefinition's
    // first argument)
    val clusterWindow = p.contains("windowspecdefinition(cent_id#")
    assert(!clusterWindow, s"row window over the cluster key:\n$p")
  }

  test("as-of join is a single window pass — exactly one shuffle") {
    val p = plan(Analytics.asofJoin(spark, sf))
    assert("Exchange".r.findAllIn(p).size == 1, s"expected one shuffle:\n$p")
    assert(!p.contains("Join"), s"as-of should not plan a join:\n$p")
  }

  test("decontamination broadcasts the benchmark side") {
    val p = plan(graft.operators.Pipeline.decontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("embedding near-dup runs the fused codegen cosine") {
    val p = plan(Dedup.embeddingNearDup(spark, sf))
    assert(p.contains("graft_cosine"), p)
  }

  test("FFD packing plans as ONE bounded-group shuffle — no window, no sort, no second exchange") {
    val p = plan(graft.operators.Pipeline.packFfd(spark, sf))
    assert("Exchange".r.findAllIn(p).size == 1,
      s"the fold must ride a single (source, blk) shuffle:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window "),
      s"no window over the raw docs (the fold is a per-group HOF):\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"one documents scan feeds the whole packer:\n$p")
    // the bin rollup must reuse the shard partitioning, not re-shuffle
    assert(p.contains("HashAggregate"), s"bin rollup must hash-aggregate:\n$p")
  }

  test("weighted jaccard never plans a cartesian product; candidate joins stay key-equi") {
    val p = plan(Dedup.weightedJaccard(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"multiset verification must stay candidate-bounded:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop fallback in the pair chain:\n$p")
  }

  test("boilerplate census: top-k is a bounded-heap take, text resolves via broadcast") {
    // The heavy pass (asserted pre-materialization: the executed operator
    // localCheckpoints these K rows, hiding the take behind a row scan).
    val c = plan(Dedup.boilerplateCensusTop(spark, sf))
    assert(c.contains("TakeOrderedAndProject"),
      s"census top-k must plan as bounded heaps, not a global sort:\n$c")
    val p = plan(Dedup.boilerplateTopK(spark, sf))
    // the K winning hashes broadcast back against the window stream — the
    // census relation itself must never sort-merge against raw windows
    assert(p.contains("BroadcastHashJoin"), s"text resolution must broadcast:\n$p")
    // one-pass contract (VERDICT r12 #1): the final join reads the
    // materialized census plus exactly ONE documents scan (the <=K
    // exemplar re-shingle) — the corpus is never re-shingled per branch
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"boilerplate must not re-scan the corpus per branch:\n$p")
  }

  test("prototype pruning ranks via the histogram — no cluster-keyed window over raw rows") {
    val p = plan(Similarity.prototypePrune(spark, sf))
    // Every Window PARTITIONED BY THE CLUSTER KEY must sit above a
    // HashAggregate (the (cluster, cc4) histogram) — a cent_id window over
    // raw assignment rows would buffer whole clusters on single tasks,
    // exactly the per-cluster sort this operator exists to avoid. (The
    // quantizer's own argmax windows partition by vec_id — <= numCentroids
    // rows per key, bounded by construction — and are exempt.)
    val planLines = p.linesIterator.toVector
    val clusterWins = planLines.zipWithIndex
      .filter { case (l, _) => l.contains("Window ") && l.contains("], [cent_id") }
      .map(_._2)
    assert(clusterWins.nonEmpty, s"expected histogram windows keyed on cent_id:\n$p")
    clusterWins.foreach { wi =>
      val below = planLines.drop(wi + 1)
      val aggAt = below.indexWhere(_.contains("HashAggregate"))
      val scanAt = below.indexWhere(_.contains("Scan parquet"))
      assert(aggAt >= 0 && (scanAt < 0 || aggAt < scanAt),
        s"a cluster-keyed Window sits on raw rows (no histogram aggregate between):\n$p")
    }
    // keep/drop is a broadcast join against the tiny threshold relation
    assert(p.contains("BroadcastHashJoin"), s"threshold join must broadcast:\n$p")
  }

  test("forecast revenue pushes every filter into the parquet scan") {
    // plain toString truncates PushedFilters; formatted mode prints all
    val p = Analytics.forecastRevenue(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
      "LessThan(l_quantity,24.0)").foreach { f =>
      assert(p.contains(f), s"filter $f not pushed:\n$p")
    }
  }

  test("late-priority EXISTS plans as a semi join") {
    val p = plan(Analytics.latePriority(spark, sf))
    assert(p.contains("LeftSemi"), p)
  }

  test("global sort output is totally ordered across partition boundaries (TeraValidate)") {
    val rows = MapReduce.sort(spark, sf)
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.sameElements(rows.sorted), "rows not globally sorted")
  }

  test("minhash LSH pairs expand inside buckets — census broadcast, no signature self-join") {
    val p = plan(Dedup.minhashLsh(spark, sf))
    // Two narrow scans: the signature pass and the bucket census. What must
    // NEVER appear is a shuffle join of the signature relation against
    // itself (the candidates-by-self-join shape).
    assert("FileScan parquet".r.findAllIn(p).size == 2, s"expected signature + census scans:\n$p")
    assert(!p.contains("SortMergeJoin"), s"signature relation self-joined through a shuffle:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"bucket counts are not broadcast back:\n$p")
  }

  test("returned-items top-20 plans as TakeOrderedAndProject with broadcast nation") {
    val p = plan(Analytics.returnedItems(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)") ||
      p.contains("EqualTo(l_returnflag,R)"), s"returnflag filter not pushed:\n$p")
  }

  test("substring dedup is pure aggregation over window hashes — no window op, no pair expansion") {
    val p = plan(Dedup.substringDup(spark, sf))
    assert(!p.contains("Window"), s"cross-doc occurrence must aggregate, not window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"substring audit must never expand pairs:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"expected map-side partial aggregation:\n$p")
  }

  test("market share broadcasts every dim chain and plans no window") {
    val p = plan(Analytics.marketShare(spark, sf))
    assert(!p.contains("Window"), s"Q8 share is an aggregate ratio, never a window:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"part/nation x2/region must all broadcast:\n$p")
    assert(p.contains("EqualTo(p_type,PROMO)"), s"part type filter not pushed:\n$p")
  }

  test("top-supplier max is a broadcast 1-row aggregate, not a global window") {
    val p = plan(Analytics.topSupplier(spark, sf))
    assert(!p.contains("Window"), s"Q15 max should not plan a single-partition window:\n$p")
    assert(p.contains("Broadcast"), p)
  }

  test("discount revenue (OR-of-ANDs) broadcasts part and keeps lineitem scan filters") {
    val p = plan(Analytics.discountRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("idle-customers plans an anti join, never distinct-then-join") {
    val p = plan(Analytics.idleCustomers(spark, sf))
    assert(p.contains("LeftAnti"), p)
  }

  /** Window shapes of the optimized logical plan, STRUCTURALLY: for every
    * Window operator, (partition-key column names, first order-key column
    * name). Immune to the attribute-id / type-suffix formatting of plan
    * strings (which a Spark version bump reshuffles silently). */
  private def windowShapes(df: org.apache.spark.sql.DataFrame): Seq[(Seq[String], String)] =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        (w.partitionSpec.map(_.references.map(_.name).mkString("+")),
          w.orderSpec.headOption.map(_.child.references.map(_.name).mkString("+")).getOrElse(""))
    }

  test("pack's cumulative sum is a two-level prefix sum, never a per-source window over raw docs") {
    // `sum over Window.partitionBy(source).orderBy(doc_id)` on the raw doc
    // stream ships an ENTIRE source to one task (~5 TB per partition at
    // 100 TB) — the windows allowed here are the block-local cumsum
    // (partition key (source, blk), bounded by PackBlock doc_ids) and the
    // per-source prefix over block SUBTOTALS (a PackBlock-fold smaller
    // relation, ordered by blk, not doc_id); the offsets then broadcast.
    val shapes = windowShapes(graft.operators.Pipeline.pack(spark, sf))
    assert(!shapes.contains((Seq("source"), "doc_id")),
      s"pack windows the raw per-source doc stream on one task: $shapes")
    assert(shapes.contains((Seq("source", "blk"), "doc_id")),
      s"expected the block-local bounded cumsum window: $shapes")
    val p = plan(graft.operators.Pipeline.pack(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"block offsets must broadcast back:\n$p")
  }

  test("BPE-budgeted pack equals the single-window reference bit for bit") {
    // The two-level prefix sum must be invisible for ANY per-row counter:
    // replay the chunk manifest with the naive one-window cumsum (fine at
    // spec scale, the 100 TB hazard pack exists to avoid) over the SAME
    // BPE counts and compare exactly.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ctx = graft.operators.Pipeline.CtxTokens
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        graft.operators.TextOps.bpeCount(col("text")).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("chunk_id", expr(s"(cum - n_tok) DIV $ctx"))
      .groupBy("source", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        (floor(sum(col("n_tok")) / lit(ctx.toDouble) * 1e6 + 0.5) / 1e6).as("fill_ratio"))
      .collect().map(_.toSeq).toSet
    val got = graft.operators.Pipeline.packBpe(spark, sf).collect().map(_.toSeq).toSet
    assert(got == ref, "BPE pack diverged from the single-window reference")
  }

  test("shard's rank is distributed: no raw per-source or per-(source,size) doc window") {
    // A naive `row_number() OVER (PARTITION BY source ...)` — or one inside
    // (source, n_tok) without the block split — sorts a whole source (or a
    // whole size class) on one task. The only window allowed over the raw
    // doc stream is the block-local rank inside (source, n_tok, blk); the
    // forbidden shapes pair the partition keys with the doc_id sort key,
    // so the aggregate-sized histogram/subtotal windows (ordered by n_tok
    // or blk) stay legitimate.
    val shapes = windowShapes(graft.operators.Pipeline.shard(spark, sf))
    assert(!shapes.contains((Seq("source"), "doc_id")),
      s"shard windows the raw per-source doc stream on one task: $shapes")
    assert(!shapes.contains((Seq("source", "n_tok"), "doc_id")),
      s"shard windows a whole (source, n_tok) class on one task: $shapes")
    assert(shapes.contains((Seq("source", "n_tok", "blk"), "doc_id")),
      s"expected the block-local bounded rank window: $shapes")
  }

  test("targeted join salting replicates ONLY census-detected heavy keys on the build side") {
    // The round-5 layout exploded EVERY build row x JoinSalt — 8x the
    // build shuffle for skew that touches a handful of keys. Targeted
    // salting must keep every explode (salt replication) behind a
    // heavy-key semi join, so the plain-rest branch ships unreplicated.
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val lp = Analytics.joinSalted(spark, sf).queryExecution.optimizedPlan
    val gens = lp.collect { case g: Generate => g }
    assert(gens.nonEmpty, s"salted branch must explode build-side salts:\n$lp")
    gens.foreach { g =>
      assert(g.collectFirst { case j: Join if j.joinType == LeftSemi => j }.isDefined,
        s"an explode replicates an UNRESTRICTED build side:\n$g")
    }
  }

  test("shard deals round-robin: per-source doc counts and token totals stay balanced") {
    import org.apache.spark.sql.functions._
    val m = graft.operators.Pipeline.shard(spark, sf)
      .groupBy("source")
      .agg((max(col("n_docs")) - min(col("n_docs"))).as("ddocs"),
        (max(col("total_tokens")) - min(col("total_tokens"))).as("dtok"),
        max(col("max_tokens")).as("biggest"),
        sum(col("n_docs")).as("n"))
      .collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getAs[Long]("ddocs") <= 1, s"${r.getString(0)}: doc counts unbalanced")
      // descending round-robin keeps shard totals within one max-document
      assert(r.getAs[Long]("dtok") <= r.getAs[Long]("biggest"),
        s"${r.getString(0)}: token totals unbalanced beyond one max doc")
    }
    val total = m.map(_.getAs[Long]("n")).sum
    val docs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(total == docs, s"sharding lost docs: $total != $docs")
  }

  test("packing manifest tokens add up to the corpus token count") {
    import org.apache.spark.sql.functions._
    val packed = graft.operators.Pipeline.pack(spark, sf)
      .agg(sum("n_tokens")).collect().head.getLong(0)
    val total = TextOps.tokens(spark, sf)
      .agg(sum(col("n_ws").cast("long"))).collect().head.getLong(0)
    assert(packed == total, s"packing lost tokens: $packed != $total")
  }

  test("weighted sampling keeps within rate bounds per source") {
    import org.apache.spark.sql.functions._
    val bad = graft.operators.Pipeline.sampleWeighted(spark, sf)
      .filter(col("n_kept") > col("n_total") ||
        col("rate") < 20 || col("rate") > 38).count()
    assert(bad == 0)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import org.apache.spark.sql.functions._
    val keys = Seq("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "64KB")
      spark.conf.set(keys(1), "2")
      spark.conf.set(keys(2), "16KB")
      spark.conf.set(keys(3), "-1") // force a shuffle join
      // one hot key carrying most rows — the 100 TB skew shape. The pad
      // column must survive the join (no pruning) so the hot partition's
      // shuffle bytes actually exceed the skew threshold.
      val left = spark.range(60000).select(
        when(col("id") < 50000, 0L).otherwise(col("id")).as("k"),
        // non-foldable payload: a literal pad would be constant-folded out
        // of the shuffle and the hot partition would stay under threshold
        concat(md5(col("id").cast("string").cast("binary")),
          md5((col("id") + 1).cast("string").cast("binary"))).as("pad"))
      val right = spark.range(1000).select(col("id").as("k"), lit(1).as("v"))
      // collect() executes THIS dataset's queryExecution so AQE finalizes
      // it (foreach/rdd use a separate rddQueryExecution and would leave
      // the observed plan unexecuted).
      val j = left.join(right, "k")
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not split the skewed partition:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("KMV sketch estimates within the 1/sqrt(k) error band of exact distinct") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Extras.sketchDistinct(spark, sf)
      .select(col("source"), col("n_exact"), col("est_distinct")).collect()
    assert(rows.nonEmpty, "every source should have >= k distinct shingles")
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val rel = math.abs(r.getDouble(2) - exact) / exact
      assert(rel < 0.35, s"${r.getString(0)}: KMV rel error $rel (exact=$exact est=${r.getDouble(2)})")
    }
  }

  test("count-min top-k only ever overestimates, is near-exact at this width, and broadcasts the sketch") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Extras.sketchTopK(spark, sf)
    val rows = df.collect()
    assert(rows.length == graft.operators.Extras.CmsTopK)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"${r.getString(0)}: CMS must never underestimate (est=${r.getLong(1)} exact=${r.getLong(2)})")
    }
    // vocab << d*w, so collisions are rare: the top-k set should be the
    // exact top-k set at this scale (the sketch's job is the 100 TB case
    // where the exact branch is dropped).
    assert(rows.count(r => r.getLong(1) == r.getLong(2)) >= rows.length / 2,
      "at vocab << width, most heavy hitters should estimate exactly")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"sketch probe must broadcast the 1024-cell sketch:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be sort-limit:\n$p")
  }

  test("dataset build: id-only gate joins, no cartesian, no global sort") {
    // the gate chain is asserted on the pre-pack base (packOf's checkpoint
    // hides upstream operators from the packed plan)
    val p = plan(graft.operators.Pipeline.buildBaseDefault(spark, sf))
    assert(p.contains("LeftSemi"), s"gates must compose as semi joins:\n${p.take(2000)}")
    assert(p.contains("LeftAnti"), s"decontamination must be an anti join:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere in the build")
    assert(!p.contains("rangepartitioning"), "no sampled global sort in the build")
    val packed = plan(graft.operators.Pipeline.build(spark, sf))
    assert(!packed.contains("rangepartitioning"), "no global sort in the pack tail")
  }

  test("trained build keeps the build contract; trained gate is broadcast-literal scoring") {
    val root = java.nio.file.Files.createTempDirectory("graft-plans-trained").toString
    graft.operators.AnnModels.withRoot(root) {
      val p = plan(graft.operators.Pipeline.buildBaseTrained(spark, sf))
      assert(p.contains("LeftSemi"), s"gates must compose as semi joins:\n${p.take(2000)}")
      assert(p.contains("LeftAnti"), s"decontamination must be an anti join:\n${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), "no cartesian anywhere in the trained build")
      assert(!p.contains("rangepartitioning"), "no sampled global sort in the trained build")
      // the gate itself: centroids are LITERAL coefficients (collected from
      // the model-sized artifact), so scoring adds no join or exchange of
      // its own beyond the LM surprise join
      val pg = plan(graft.operators.TextOps.qualityTrained(spark, sf))
      assert(!pg.contains("CartesianProduct") && !pg.contains("rangepartitioning"),
        s"trained scoring must stay join-light:\n${pg.take(2000)}")
    }
  }

  test("calibrated build keeps the build contract; calibrated gate never globally sorts") {
    val p = plan(graft.operators.Pipeline.buildBaseCalibrated(spark, sf))
    assert(p.contains("LeftSemi"), s"gates must compose as semi joins:\n${p.take(2000)}")
    assert(p.contains("LeftAnti"), s"decontamination must be an anti join:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere in the calibrated build")
    assert(!p.contains("rangepartitioning"), "no sampled global sort in the calibrated build")
    assert(!plan(graft.operators.Pipeline.buildCalibrated(spark, sf)).contains("rangepartitioning"),
      "no global sort in the calibrated pack tail")
    val pg = plan(graft.operators.TextOps.qualityCalibrated(spark, sf))
    assert(!pg.contains("rangepartitioning"),
      s"threshold selection must use the census, not a global sort:\n${pg.take(2000)}")
    assert(pg.contains("windowspecdefinition(blk#"),
      s"census cumsum must partition by the value block:\n${pg.take(2000)}")
  }

  test("ordered build: mixture-interleaved chunk manifest, broadcast shares, no global sort") {
    val df = graft.operators.Pipeline.buildOrdered(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), "no cartesian in the ordered build tail")
    assert(!p.contains("rangepartitioning"),
      "the loader order must come from the key-block rank, not a global sort")
    assert(p.contains("BroadcastHashJoin"),
      s"the tempered shares must broadcast onto the manifest:\n${p.take(2000)}")
    val rows = df.collect()
    // load_pos is a dense 0-based permutation of the manifest
    assert(rows.map(_.getAs[Long]("load_pos")).sorted.toSeq ==
      (0L until rows.length).toSeq, "load_pos must be a dense permutation")
    // within a source, the loader reads chunks in packing order
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val byChunk = rs.sortBy(_.getAs[Long]("chunk_id")).map(_.getAs[Long]("load_pos"))
      assert(byChunk.sorted.toSeq == byChunk.toSeq,
        s"source $src chunks must stream in packing order: ${byChunk.mkString(",")}")
    }
    // the manifest itself is exactly the calibrated build's
    val manifest = rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("chunk_id"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toSet
    val base = graft.operators.Pipeline.buildCalibrated(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toSet
    assert(manifest == base, "ordering must not alter the manifest")
  }

  test("delta pack: base offsets broadcast, no global sort, no cartesian") {
    val p = plan(graft.operators.Pipeline.packDelta(spark, sf))
    assert(!p.contains("rangepartitioning"),
      "the delta cumsum must stay two-level, never a sampled global sort")
    assert(!p.contains("CartesianProduct"),
      "the scalar split point must broadcast, not cross-join raw relations")
    assert(p.contains("BroadcastHashJoin"),
      s"per-source base offsets and level-2 offsets must broadcast:\n${p.take(2000)}")
  }

  test("trained-BPE id encoding is a shuffle-free scan pass") {
    // the merge table and vocab are collected at plan-build time; the
    // returned id-stream projection must be one codegen pass over the scan
    val p = plan(graft.operators.TextOps.bpeTrainedIds(spark, sf))
    assert(!p.contains("Exchange"), s"unexpected shuffle in the trained encoder pass:\n$p")
  }

  test("streaming-incremental batch analog hashes the batch side only") {
    // same scan-only contract as dedup_incremental_lsh, now against the
    // registry artifact: ONE MinHash signature expression (the batch side);
    // corpus signatures stream off the persisted parquet index
    val root = java.nio.file.Files.createTempDirectory("graft-plans-lshidx").toString
    graft.operators.AnnModels.withRoot(root) {
      val out = graft.streaming.EventStreams.incrementalVsIndex(spark, sf)
      var sigs = 0
      out.queryExecution.optimizedPlan.foreach { node =>
        node.expressions.foreach(_.foreach {
          case _: graft.functions.MinHashSigExpr => sigs += 1
          case _ => ()
        })
      }
      assert(sigs == 1, s"expected ONE signature pass (batch only), found $sigs")
    }
  }

  test("artifact-served phash probe hashes the batch side only; alignment gate plans sort-free") {
    val root = java.nio.file.Files.createTempDirectory("graft-plans-phidx").toString
    graft.operators.AnnModels.withRoot(root) {
      // scan-only contract (the lshIndex discipline on the perceptual
      // column): the typed hash pass is a MapPartitions over the batch —
      // exactly ONE in the artifact-served plan (corpus hashes stream off
      // the parquet index), TWO in the in-query form that builds its
      // index inline
      def mapPasses(df: org.apache.spark.sql.DataFrame): Int =
        "(?m)MapPartitions".r.findAllIn(df.queryExecution.optimizedPlan.toString).length
      assert(mapPasses(graft.streaming.EventStreams.phashVsIndex(spark, sf)) == 1,
        "served probe must hash only the batch")
      // the in-query reference form builds its index inline — its printed
      // plan shows the corpus hash subtree under every census/salt branch
      // (>= 2 passes); that cost is exactly what the persisted artifact
      // deletes, which is the point of the contract above
      assert(mapPasses(graft.operators.Multimodal.phashIncremental(spark, sf)) >= 2,
        "in-query form hashes both sides by construction")
    }
    // the alignment gate: histogram census + one-row broadcast bar — no
    // global sort (rangepartitioning) anywhere, no cartesian product
    val p = graft.operators.Multimodal.textAlign(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"), s"alignment census must not global-sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"one-row bar must broadcast:\n$p")
  }

  test("bloom filter never false-negatives; a saturated filter shows real false positives") {
    import org.apache.spark.sql.functions._
    val ss = SparkSpec.spark
    import ss.implicits._
    val bld = (1L to 60L).toDF("key")
    val prb = (1L to 400L).toDF("key")
    // production-shaped m: every member passes, and at 240/65536 fill the
    // fp probability is ~1e-9 — expect zero
    val wide = graft.operators.Extras.sketchBloomOf(bld, prb, 65536L, 4).head()
    assert(wide.getLong(1) == 60 && wide.getLong(2) >= 60,
      "every true member must pass (no false negatives, ever)")
    assert(wide.getLong(3) == 0, "a near-empty filter should show no false positives")
    // saturated m=64: fill ~ 1 - (1-1/64)^240 ≈ 0.98 → nearly every
    // non-member passes; the audit must COUNT them, not hide them
    val tight = graft.operators.Extras.sketchBloomOf(bld, prb, 64L, 4).head()
    assert(tight.getLong(2) >= tight.getLong(1), "members always pass")
    assert(tight.getLong(3) > 100,
      s"a saturated filter must show mass false positives, got ${tight.getLong(3)}")
    val recount = tight.getLong(2) - tight.getLong(1)
    assert(tight.getLong(3) == recount,
      "false positives must equal passes minus members when all members pass")
  }

  test("salted join is result-identical to the plain join and keys on (orderkey, salt)") {
    import org.apache.spark.sql.functions._
    val df = Analytics.joinSalted(spark, sf)
    val p = plan(df)
    assert("salt#\\d+".r.findFirstIn(p).isDefined, s"join must key on the salt column:\n$p")
    val salted = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val one = lit(1).cast("decimal(12,2)")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(12,2)") * (one - col("l_discount").cast("decimal(12,2)")))
          .cast("double").as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain, "salting changed the join result")
  }

  test("salting bucket census is a broadcast aggregate, never a Window over dense buckets") {
    // A `count over Window.partitionBy(bucket)` ships every row of a dense
    // bucket to ONE task before the salt exists — the 100 TB anti-pattern
    // this guards against. The census must be a groupBy count broadcast back.
    // dedup_simhash_pairs is the INLINE chain here: the gated entry serves
    // the registry pair artifact since r15 (asserted below), so the
    // census-broadcast discipline is pinned on the trainer it rides.
    Seq("dedup_simhash_pairs (inline)" -> plan(Dedup.simhashPairsInline(spark, sf)),
        "sim_knn_graph (inline)" -> plan(Similarity.knnGraphInline(spark, sf)),
        "dedup_embedding" -> plan(Dedup.embeddingNearDup(spark, sf))).foreach { case (name, p) =>
      assert(!p.contains("Window"), s"$name plans a windowed bucket census:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$name bucket counts are not broadcast back:\n$p")
    }
    // the gated entries themselves plan as ONE artifact scan — no hash
    // chain, no census, no exchange on the per-invocation path (the knn
    // graph joined the served family in r16)
    Seq("dedup_simhash_pairs" -> plan(Dedup.simhashPairs(spark, sf)),
        "sim_knn_graph" -> plan(Similarity.knnGraph(spark, sf))).foreach { case (name, served) =>
      assert(served.contains("FileScan") && !served.contains("Exchange"),
        s"served $name must plan as a bare artifact read:\n$served")
    }
  }

  test("per-query ANN top-k ranks through TopKPerKey, never a window over the raw scan") {
    // A `row_number over Window.partitionBy(query_id)` on the scored relation
    // ships each query's FULL scored scan (the whole corpus, for bruteforce
    // and the PQ compressed scan) to one task and fully sorts it — 20 tasks
    // of 10^9-row sort+spill at 100 TB while the cluster idles. The custom
    // TopKPerKey operator must bound the shuffle first; the only Window
    // allowed is the rank assignment ABOVE it (input <= k rows per query).
    Seq("sim_topk_bruteforce" -> plan(Similarity.topkBruteforce(spark, sf)),
        "sim_ann_pq" -> plan(Similarity.annPq(spark, sf)),
        "sim_ann_lsh" -> plan(Similarity.annLsh(spark, sf)),
        "sim_ann_ivf" -> plan(Similarity.annIvf(spark, sf)),
        "sim_ann_ivfpq" -> plan(Similarity.annIvfPq(spark, sf))).foreach { case (name, p) =>
      assert(p.contains("TopKPerKey"), s"$name must rank through TopKPerKey:\n$p")
      assert(p.indexOf("Window") >= 0 && p.indexOf("Window") < p.indexOf("TopKPerKey"),
        s"$name rank window must consume TopKPerKey's survivors:\n$p")
    }
    // bruteforce and PQ have no other windows at all: exactly the rank one
    Seq("sim_topk_bruteforce" -> plan(Similarity.topkBruteforce(spark, sf)),
        "sim_ann_pq" -> plan(Similarity.annPq(spark, sf))).foreach { case (name, p) =>
      assert("Window".r.findAllIn(p).size == 1,
        s"$name must plan exactly the bounded rank window:\n$p")
    }
  }

  test("retention cohort sizes broadcast back to the offset aggregation") {
    val p = plan(Analytics.retentionCohort(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"cohort sizes should broadcast:\n$p")
  }

  test("perplexity trigram counts line up with token counts (n_grams = n_ws - 2)") {
    import org.apache.spark.sql.functions._
    val joined = TextOps.perplexity(spark, sf)
      .join(TextOps.tokens(spark, sf), "doc_id")
    assert(joined.filter(col("n_grams") =!= col("n_ws") - 2).count() == 0)
    assert(joined.filter(col("avg_nll").isNull || col("avg_nll") <= 0).count() == 0,
      "every add-one-smoothed interpolated nll must be positive")
  }

  test("DSIR serving plans broadcast the model; no shuffle beyond the token rollup") {
    val root = java.nio.file.Files.createTempDirectory("graft-plans-dsir").toString
    graft.operators.AnnModels.withRoot(root) {
      // selection: the 256-row log-ratio table joins as a BROADCAST side
      // and the 1-row bar rides a broadcast nested-loop crossJoin — never
      // a CartesianProduct, never a sampled global sort
      val p = plan(graft.operators.TextOps.importanceDsir(spark, sf))
      assert(p.contains("BroadcastHashJoin"),
        s"the log-ratio model must broadcast into the scoring join:\n${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), s"no cartesian in DSIR selection:\n${p.take(2000)}")
      assert(!p.contains("rangepartitioning"), "no global sort in DSIR selection")
      // admission: same contract on the gate's scoring pass
      val pg = plan(graft.streaming.EventStreams.ingestDsirBatch(spark, sf))
      assert(pg.contains("BroadcastHashJoin") && !pg.contains("CartesianProduct") &&
        !pg.contains("rangepartitioning"), s"admission plan contract:\n${pg.take(2000)}")
    }
  }

  test("mm gates plan without pair expansion") {
    // the filter is a pure map (asserted shuffle-free in MultimodalSpec);
    // the pair GENERATOR must never go cartesian — assert on phashPairs,
    // whose lineage is un-truncated (phashKeep/phashDedup localCheckpoint
    // their inputs, so a cartesian there would execute before the plan
    // string is ever rendered and the assert would be vacuous)
    val p = plan(graft.operators.Multimodal.phashPairs(spark, sf))
    assert(!p.contains("CartesianProduct"), s"no cartesian in phash pairing:\n${p.take(2000)}")
    assert(!p.contains("rangepartitioning"), "no sampled global sort in phash pairing")
  }
}
