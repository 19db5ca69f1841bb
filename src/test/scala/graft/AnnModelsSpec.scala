package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{AnnModels, Dedup, Similarity}

/** The persisted-model contract (VERDICT r6 #2): Lloyd's runs at most ONCE
  * per (dataset, constants) across every consumer, later consumers read the
  * parquet artifact, and artifact-served queries are bit-identical to
  * inline training (the oracle replays training from scratch, so parity
  * here is what keeps the correctness gate meaningful).
  */
class AnnModelsSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-annmodels-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("IVF centroids train exactly once per dataset; the artifact serves all later reads") {
    AnnModels.withRoot(freshRoot("ivf")) {
      val t0 = AnnModels.ivfTrains
      val first = rows(AnnModels.ivfCentroids(spark, sf))
      assert(AnnModels.ivfTrains == t0 + 1, "first access must train")
      val second = AnnModels.ivfCentroids(spark, sf)
      assert(AnnModels.ivfTrains == t0 + 1, "second access must serve the artifact, not retrain")
      assert(second.inputFiles.nonEmpty &&
        second.inputFiles.forall(_.contains("graft-annmodels-ivf")),
        s"artifact read must scan the model store, got ${second.inputFiles.mkString(",")}")
      assert(rows(second) == first, "artifact round-trip changed the model")
    }
  }

  test("artifact-served centroids are bit-identical to inline training") {
    AnnModels.withRoot(freshRoot("parity")) {
      val ivfArtifact = rows(AnnModels.ivfCentroids(spark, sf))
      val ivfInline = rows(Similarity.trainIvfCentroids(spark, sf,
        Similarity.KMeansIters, Similarity.TrainMod, Similarity.ivfK(spark, sf)))
      assert(ivfArtifact == ivfInline, "IVF artifact diverges from inline training")
      val pqArtifact = rows(AnnModels.pqCodebook(spark, sf))
      val pqInline = rows(Similarity.trainPqCodebook(spark, sf))
      assert(pqArtifact == pqInline, "PQ artifact diverges from inline training")
    }
  }

  test("all five model consumers share one IVF training pass and one PQ training pass") {
    AnnModels.withRoot(freshRoot("share")) {
      val (i0, p0) = (AnnModels.ivfTrains, AnnModels.pqTrains)
      Similarity.annIvf(spark, sf).collect()
      Similarity.annPq(spark, sf).collect()
      Similarity.annIvfPq(spark, sf).collect()
      Dedup.semanticDedup(spark, sf).collect()
      Dedup.semanticDedupKeep(spark, sf).collect()
      assert(AnnModels.ivfTrains == i0 + 1,
        s"expected ONE IVF training pass across consumers, got ${AnnModels.ivfTrains - i0}")
      assert(AnnModels.pqTrains == p0 + 1,
        s"expected ONE PQ training pass across consumers, got ${AnnModels.pqTrains - p0}")
    }
  }

  test("trigram LM trains once per dataset and artifact scores are bit-identical") {
    AnnModels.withRoot(freshRoot("lm")) {
      val t0 = AnnModels.lmTrains
      val first = rows(graft.operators.TextOps.perplexity(spark, sf))
      assert(AnnModels.lmTrains == t0 + 1, "first access must train the LM")
      // artifact-served run: no retraining, identical scores
      val second = rows(graft.operators.TextOps.perplexity(spark, sf))
      assert(AnnModels.lmTrains == t0 + 1, "second access must serve the artifact")
      assert(second == first, "artifact round-trip changed perplexity scores")
      // inline training (the df-based spec path) agrees exactly
      val inline = rows(graft.operators.TextOps.perplexityOf(
        graft.sources.Tables.load(spark, sf, "documents")))
      assert(first == inline, "artifact diverges from inline LM training")
      // the downstream model consumers share the one trained LM
      graft.operators.TextOps.qualityModel(spark, sf).collect()
      graft.operators.Pipeline.curateModel(spark, sf).collect()
      assert(AnnModels.lmTrains == t0 + 1,
        s"LM consumers retrained: ${AnnModels.lmTrains - t0} passes")
    }
  }

  test("langid centroids train once; artifact-served scoring is bit-identical to inline") {
    AnnModels.withRoot(freshRoot("langid")) {
      val t0 = AnnModels.langidTrains
      val first = rows(graft.operators.TextOps.langidModel(spark, sf))
      assert(AnnModels.langidTrains == t0 + 1, "first access must train the centroids")
      val second = rows(graft.operators.TextOps.langidModel(spark, sf))
      assert(AnnModels.langidTrains == t0 + 1, "second access must serve the artifact")
      assert(second == first, "artifact round-trip changed predictions")
      val inline = rows(graft.operators.TextOps.langidModelOf(
        graft.sources.Tables.load(spark, sf, "documents")))
      assert(first == inline, "artifact-served scoring diverges from inline training")
    }
  }

  test("BPE merge table trains once; the trained table drives the encoder chain") {
    AnnModels.withRoot(freshRoot("bpe")) {
      val t0 = AnnModels.bpeTrains
      val first = rows(graft.operators.TextOps.bpeTrainedIds(spark, sf))
      assert(AnnModels.bpeTrains == t0 + 1, "first access must train the merge table")
      val second = rows(graft.operators.TextOps.bpeTrainedIds(spark, sf))
      assert(AnnModels.bpeTrains == t0 + 1, "second access must serve the artifact")
      assert(second == first, "artifact round-trip changed the id stream")
      assert(rows(AnnModels.bpeMergeTable(spark, sf)) ==
        rows(graft.operators.TextOps.bpeTrain(spark, sf)),
        "persisted merge table diverges from inline training")
      // the trained chain is a REAL tokenizer output: ids per doc, and the
      // trained table differs from the static constant's vocabulary ids
      assert(first.nonEmpty)
    }
  }

  test("quality centroids train once; the trained gate splits the corpus") {
    AnnModels.withRoot(freshRoot("qual")) {
      val t0 = AnnModels.qualityTrains
      val first = rows(graft.operators.TextOps.qualityTrained(spark, sf))
      assert(AnnModels.qualityTrains == t0 + 1, "first access must train the centroids")
      val second = rows(graft.operators.TextOps.qualityTrained(spark, sf))
      assert(AnnModels.qualityTrains == t0 + 1, "second access must serve the artifact")
      assert(second == first, "artifact round-trip changed the gate")
      // non-degenerate on the shipped corpus: the learned hyperplane keeps
      // some and drops some (the >=6-of-7 seed split generalizes)
      val keeps = graft.operators.TextOps.qualityTrained(spark, sf)
        .groupBy("trained_keep").count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(keeps.getOrElse(1, 0L) > 0 && keeps.getOrElse(0, 0L) > 0,
        s"trained gate must split the corpus, got $keeps")
    }
  }

  test("single-class seed corpus: trained gate degrades deterministically") {
    val sp = spark
    import sp.implicits._
    // every doc fails r_word_count (too short) -> positive class empty ->
    // keep centroid is the zero vector; the gate must still score every
    // document (margin = -2x.c0 + |c0|^2 compare), not crash or emit null
    val d = Seq((2L, "tiny doc"), (4L, "two words"), (6L, "-"), (7L, "odd id"))
      .toDF("doc_id", "text")
    val cent = graft.operators.TextOps.trainQualityCentroidsOf(
      d, graft.operators.TextOps.perplexityOf(d)).collect()
    assert(cent.map(_.getInt(0)).toSet == Set(0), "only the fail class trains")
    val out = graft.operators.TextOps.qualityTrainedWith(
      graft.operators.TextOps.qualityFeaturesOf(d, graft.operators.TextOps.perplexityOf(d)),
      cent).collect()
    assert(out.length == 4 && out.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("in-place corpus mutation invalidates artifacts: the incremental probe sees new docs") {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-fresh").toString
    val dir = s"$base/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def writeDocs(rows: Seq[(Long, String, String)]): Unit = {
      val tmp = s"$base/tmp"
      rows.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, "documents.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    AnnModels.withRoot(freshRoot("fresh")) {
      writeDocs(Seq(
        (1L, "srcA", shared),
        (2L, "srcA", "unrelated corpus filler content nine ten eleven twelve"),
        (10L, "src0", shared)))
      val b0 = AnnModels.lshIndexBuilds
      val first = graft.streaming.EventStreams.incrementalVsIndex(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(first == Set((10L, 1L, 0)), s"probe matches the one corpus copy: $first")
      assert(AnnModels.lshIndexBuilds == b0 + 1)
      // MUTATE the corpus IN PLACE at the same path: add corpus doc 5 with
      // the shared text. Without the freshness fingerprint the persisted
      // index still exists for this (dir, params) key and doc 5 would be
      // invisible to every later probe — silent wrong answers.
      writeDocs(Seq(
        (1L, "srcA", shared),
        (2L, "srcA", "unrelated corpus filler content nine ten eleven twelve"),
        (5L, "srcB", shared),
        (10L, "src0", shared)))
      val second = graft.streaming.EventStreams.incrementalVsIndex(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(AnnModels.lshIndexBuilds == b0 + 2,
        "in-place mutation must retrain the index")
      assert(second == Set((10L, 2L, 0)),
        s"retrained index must surface the backfilled corpus doc: $second")
    }
  }

  test("phash index: builds once, serves the stream probe, retrains on corpus edit") {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-phidx").toString
    val dir = s"$base/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def writeDocs(rows: Seq[(Long, String, String)]): Unit = {
      val tmp = s"$base/stage"
      rows.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, "documents.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val shared = "identical payload bytes for the perceptual cluster " * 3
    AnnModels.withRoot(freshRoot("phidx")) {
      writeDocs(Seq(
        (1L, "srcA", shared),
        (2L, "srcA", "unrelated corpus asset content nine ten eleven twelve"),
        (10L, "src0", shared)))
      val b0 = AnnModels.phashIndexBuilds
      val first = graft.streaming.EventStreams.phashVsIndex(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(first == Set((10L, 1L, 0)), s"probe matches the one corpus copy: $first")
      assert(AnnModels.phashIndexBuilds == b0 + 1)
      // artifact-served form == the in-query form, and serving never retrains
      val inQuery = graft.operators.Multimodal.phashIncremental(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(inQuery == first, "artifact-served probe diverged from the in-query form")
      graft.streaming.EventStreams.phashVsIndex(spark, dir).collect()
      assert(AnnModels.phashIndexBuilds == b0 + 1, "second probe must serve the artifact")
      // in-place corpus backfill: a second copy of the shared payload must
      // retrain the index and surface in the next probe
      writeDocs(Seq(
        (1L, "srcA", shared),
        (2L, "srcA", "unrelated corpus asset content nine ten eleven twelve"),
        (5L, "srcB", shared),
        (10L, "src0", shared)))
      val second = graft.streaming.EventStreams.phashVsIndex(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(AnnModels.phashIndexBuilds == b0 + 2,
        "in-place mutation must retrain the index")
      assert(second == Set((10L, 2L, 0)),
        s"retrained index must surface the backfilled corpus asset: $second")
    }
  }

  test("phash labels artifact: one CC run serves both phash dedup and keep-best-copy") {
    AnnModels.withRoot(freshRoot("phlab")) {
      val b0 = AnnModels.phashLabelBuilds
      val dedup = graft.operators.Multimodal.phashDedup(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(AnnModels.phashLabelBuilds == b0 + 1, "first consumer must build the labeling")
      graft.operators.Multimodal.phashKeep(spark, sf).collect()
      assert(AnnModels.phashLabelBuilds == b0 + 1,
        "the second consumer must serve the same artifact")
      // served labels are bit-identical to the inline CC run
      val inline = graft.operators.Multimodal.phashLabelsOf(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val served = AnnModels.phashLabels(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(served == inline, "artifact-served labeling diverged from the inline CC run")
      assert(dedup.iterator.map(_._2).sum == served.size.toLong,
        "n_repr must conserve the asset count")
    }
  }

  test("quality logits and trained margins: registry-served, bit-identical to inline") {
    val T = graft.operators.TextOps
    AnnModels.withRoot(freshRoot("qlog")) {
      val a0 = AnnModels.qualityLogitTrains
      val served = rows(T.qualityModel(spark, sf))
      assert(AnnModels.qualityLogitTrains == a0 + 1, "first consumer must score the corpus")
      assert(served == rows(T.qualityModelInline(spark, sf)),
        "artifact-served logits diverged from the inline scoring chain")
      T.qualityCalibrated(spark, sf).collect()
      graft.operators.Pipeline.curateModel(spark, sf).collect()
      assert(AnnModels.qualityLogitTrains == a0 + 1,
        "calibrated gate and curation must serve the one scored relation")
      val b0 = AnnModels.trainedMarginTrains
      val servedT = rows(T.qualityTrained(spark, sf))
      assert(AnnModels.trainedMarginTrains == b0 + 1)
      assert(servedT == rows(T.qualityTrainedInline(spark, sf)),
        "artifact-served margins diverged from the inline trained chain")
      graft.operators.Pipeline.buildTrained(spark, sf).collect()
      assert(AnnModels.trainedMarginTrains == b0 + 1,
        "the build capstone must serve the trained relation")
    }
  }

  test("shingle-pair store: one posting-list expansion serves all four verifiers") {
    AnnModels.withRoot(freshRoot("shpairs")) {
      val b0 = AnnModels.shinglePairBuilds
      val jac = rows(Dedup.ngramJaccard(spark, sf))
      assert(AnnModels.shinglePairBuilds == b0 + 1, "first consumer must build the store")
      Dedup.containment(spark, sf).collect()
      Dedup.lshRecall(spark, sf).collect()
      Dedup.lshRecallBanded(spark, sf).collect()
      assert(AnnModels.shinglePairBuilds == b0 + 1,
        "all verifiers must serve the one pair store")
      // served pairs are bit-identical to the inline expansion
      assert(rows(AnnModels.shinglePairs(spark, sf)) ==
        rows(Dedup.shingleInterPairsInline(spark, sf)),
        "artifact-served pair store diverged from the inline expansion")
      assert(jac.nonEmpty, "construction check: the corpus has jaccard pairs")
    }
  }

  test("verified pairs: one candidate+verify chain serves the gated query, the overlap matrix and the CC trainer") {
    AnnModels.withRoot(freshRoot("vpairs")) {
      val v0 = AnnModels.verifiedPairBuilds
      val served = rows(Dedup.minhashVerified(spark, sf))
      assert(AnnModels.verifiedPairBuilds == v0 + 1, "first consumer must run the chain")
      assert(served == rows(Dedup.minhashVerifiedInline(spark, sf)),
        "artifact-served verified pairs diverged from the inline chain")
      assert(served.nonEmpty, "construction check: the corpus has verified pairs")
      Dedup.sourceOverlap(spark, sf).collect()
      Dedup.survivors(spark, sf).collect()
      assert(AnnModels.verifiedPairBuilds == v0 + 1,
        "the overlap matrix and the survivor trainer must serve the one pair relation")
    }
  }

  test("perplexity scores: one scoring pass serves the bucket, curriculum and gate consumers") {
    val T = graft.operators.TextOps
    AnnModels.withRoot(freshRoot("ppl")) {
      val p0 = AnnModels.pplScoreTrains
      val served = rows(T.perplexity(spark, sf))
      assert(AnnModels.pplScoreTrains == p0 + 1, "first consumer must score the corpus")
      assert(served == rows(T.perplexityInline(spark, sf)),
        "artifact-served scores diverged from the inline scoring pass")
      T.perplexityBucket(spark, sf).collect()
      graft.operators.Pipeline.curriculum(spark, sf).collect()
      T.qualityModel(spark, sf).collect()
      assert(AnnModels.pplScoreTrains == p0 + 1,
        "bucket, curriculum and quality consumers must serve the one scored relation")
    }
  }

  test("nested partitioned corpus layout: an in-place partition rewrite invalidates") {
    val sp = spark
    import sp.implicits._
    // documents.parquet as a PARTITIONED directory — leaf files live under
    // source=*/ subdirectories. A non-recursive fingerprint (ADVICE r10)
    // sees only the top-level entries and misses a nested rewrite.
    val base = java.nio.file.Files.createTempDirectory("graft-nested").toString
    val dir = s"$base/corpus"
    val table = s"$dir/documents.parquet"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (1L, "srcA", "unrelated corpus filler content nine ten eleven twelve"),
      (10L, "src0", shared))
      .toDF("doc_id", "source", "text")
      .write.partitionBy("source").mode("overwrite").parquet(table)
    AnnModels.withRoot(freshRoot("nested")) {
      val b0 = AnnModels.lshIndexBuilds
      val first = graft.streaming.EventStreams.incrementalVsIndex(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(first == Set((10L, 0L, 1)), s"no corpus copy of the probe text yet: $first")
      assert(AnnModels.lshIndexBuilds == b0 + 1)
      // mutate ONE nested partition in place: a leaf file with a copy of
      // the shared text lands under source=srcA/ WITHOUT any top-level
      // file changing (the directory entry itself is not a file, so the
      // old non-recursive (name,len,mtime) listing fingerprints this
      // layout identically before and after)
      val tmp = s"$base/leaf"
      Seq((5L, shared)).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val leaf = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      java.nio.file.Files.move(leaf.toPath,
        java.nio.file.Paths.get(table, "source=srcA", "part-backfill.parquet"))
      val second = graft.streaming.EventStreams.incrementalVsIndex(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(AnnModels.lshIndexBuilds == b0 + 2,
        "a nested partition rewrite must invalidate the persisted index")
      assert(second == Set((10L, 1L, 0)),
        s"retrained index must surface the rewritten partition's doc: $second")
    }
  }

  test("stable keys: corpus mutations overwrite artifacts in place, never orphan them") {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-gc").toString
    val dir = s"$base/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def writeDocs(rows: Seq[(Long, String, String)]): Unit = {
      val tmp = s"$base/tmp"
      rows.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, "documents.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val root = freshRoot("gc")
    AnnModels.withRoot(root) {
      writeDocs(Seq(
        (1L, "srcA", "alpha beta gamma delta epsilon zeta eta theta iota"),
        (10L, "src0", "probe text one two three four five six seven eight")))
      graft.streaming.EventStreams.incrementalVsIndex(spark, dir).collect()
      def artifacts(): Set[String] =
        new java.io.File(root).listFiles().map(_.getName).toSet
      val a1 = artifacts()
      assert(a1.exists(_.startsWith("lshidx-")), s"index artifact persisted: $a1")
      // a handle served BEFORE the edits — must stay readable across the
      // next retrain (generational store: live readers survive one swap)
      val held = AnnModels.lshIndex(spark, dir)
      // three successive corpus edits: a fingerprint-keyed store would now
      // hold three full index copies (ADVICE r10 unbounded growth)
      for (i <- 2 to 4) {
        writeDocs(Seq(
          (1L, "srcA", "alpha beta gamma delta epsilon zeta eta theta iota"),
          (i.toLong, "srcB", s"edit number $i adds this corpus document"),
          (10L, "src0", "probe text one two three four five six seven eight")))
        graft.streaming.EventStreams.incrementalVsIndex(spark, dir).collect()
        if (i == 2)
          assert(held.count() >= 0, "a pre-edit handle must survive the first retrain")
      }
      assert(artifacts() == a1,
        s"retrains must reuse the same store slots: ${artifacts().diff(a1)} appeared")
      // inside the stable key: at most TWO generations (current + previous)
      val idx = new java.io.File(root).listFiles().find(_.getName.startsWith("lshidx-")).get
      val gens = idx.listFiles().filter(_.isDirectory).map(_.getName).filter(_.startsWith("g-"))
      assert(gens.length <= 2,
        s"the store must keep at most current+previous generations: ${gens.mkString(",")}")
    }
  }

  test("completion marker gates the artifact: no marker, no serve") {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-marker").toString
    val dir = s"$base/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    Seq((1L, "srcA", "the quick brown fox jumps over the lazy dog again"),
        (10L, "src0", "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "source", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val root = freshRoot("marker")
    AnnModels.withRoot(root) {
      val t0 = AnnModels.ingestGateTrains
      val first = rows(graft.streaming.EventStreams.ingestGateBatch(spark, dir))
      assert(AnnModels.ingestGateTrains == t0 + 1)
      // simulate a crash after the relations were written but before the
      // completion marker: a partially-committed artifact must retrain,
      // never serve (the mixed-state guard — ADVICE r10 atomicity)
      val ig = new java.io.File(root).listFiles().find(_.getName.startsWith("ig-")).get
      val marker = new java.io.File(ig, "_GRAFT_COMPLETE")
      assert(marker.exists(), "training must leave a completion marker")
      assert(marker.delete())
      val second = rows(graft.streaming.EventStreams.ingestGateBatch(spark, dir))
      assert(AnnModels.ingestGateTrains == t0 + 2,
        "an unmarked artifact must retrain, not serve")
      assert(second == first)
      // and the four relations live under ONE marker-gated generation dir
      val gens = ig.listFiles().filter(f => f.isDirectory && f.getName.startsWith("g-"))
      assert(gens.nonEmpty, s"generation dir expected under ${ig.getName}")
      val parts = gens.head.listFiles().filter(_.isDirectory).map(_.getName).toSet
      assert(parts == Set("c3", "c2", "u", "thr"),
        s"all gate relations share one generation directory: $parts")
    }
  }

  test("survivor labeling trains once; all curation consumers serve the artifact") {
    AnnModels.withRoot(freshRoot("cclab")) {
      val b0 = AnnModels.survivorBuilds
      val first = rows(Dedup.survivors(spark, sf))
      assert(AnnModels.survivorBuilds == b0 + 1, "first access must run the CC chain")
      // every other consumer of the canonical set serves the artifact
      graft.operators.Pipeline.curateNearDup(spark, sf).collect()
      graft.operators.Pipeline.build(spark, sf).collect()
      val second = rows(Dedup.survivors(spark, sf))
      assert(AnnModels.survivorBuilds == b0 + 1,
        s"curation consumers re-ran CC: ${AnnModels.survivorBuilds - b0} passes")
      assert(second == first, "artifact round-trip changed the survivor set")
    }
  }

  test("DSIR model trains once; artifact-served selection is bit-identical to the inline fit") {
    AnnModels.withRoot(freshRoot("dsir")) {
      val t0 = AnnModels.dsirTrains
      val served = rows(graft.operators.TextOps.importanceDsir(spark, sf))
      assert(AnnModels.dsirTrains == t0 + 1, "first access must train")
      // DECIMAL(18,6) log-ratios and long thresholds parquet round-trip
      // exactly, so the artifact-served chain must reproduce the inline
      // fit bit for bit — the property that lets the oracle replay
      // training from the raw corpus while the engine serves the registry
      val inline = rows(graft.operators.TextOps.importanceDsirOf(
        graft.sources.Tables.load(spark, sf, "documents")))
      assert(served == inline, "artifact-served selection diverged from the inline fit")
      graft.operators.TextOps.importanceDsir(spark, sf).collect()
      assert(AnnModels.dsirTrains == t0 + 1,
        "second access must serve the artifact, not retrain")
    }
  }

  test("DSIR 8k width: own artifact key, inline parity, improved seed enrichment") {
    import org.apache.spark.sql.functions._
    AnnModels.withRoot(freshRoot("dsir8k")) {
      val T = graft.operators.TextOps
      val t0 = AnnModels.dsirTrains
      val wide = T.importanceDsir8k(spark, sf)
      val wideRows = rows(wide)
      assert(AnnModels.dsirTrains == t0 + 1, "first 8k access must train")
      // bit-identical to the inline fit at the same width (the oracle
      // replays the full train, so this is what keeps the gate meaningful)
      val inline = rows(T.importanceDsirOf(
        graft.sources.Tables.load(spark, sf, "documents"), T.DsirBuckets8k))
      assert(wideRows == inline, "8k artifact-served selection diverged from inline fit")
      T.importanceDsir8k(spark, sf).collect()
      assert(AnnModels.dsirTrains == t0 + 1, "second access must serve the artifact")
      // the 256-bucket model lives under a DIFFERENT key: training it is a
      // separate pass and the two widths coexist in one store
      val narrow = T.importanceDsir(spark, sf)
      narrow.collect()
      assert(AnnModels.dsirTrains == t0 + 2, "the two widths must not share a key")
      // realistic width must never REGRESS seed enrichment on the shipped
      // corpus (measured: the shipped vocabulary does not alias at 256
      // buckets, so the two selections coincide exactly — the strict
      // aliasing win is demonstrated on the crafted corpus below)
      val seed = T.dsirWt(graft.sources.Tables.load(spark, sf, "documents"))
        .select(col("doc_id"), col("tgt")).distinct()
      def enrichment(seedRel: org.apache.spark.sql.DataFrame)(
          sel: org.apache.spark.sql.DataFrame): Double = {
        val kept = sel.filter(col("dsir_keep") === 1).join(seedRel, "doc_id")
        kept.filter(col("tgt") === 1).count().toDouble / kept.count()
      }
      val en = enrichment(seed) _
      assert(en(wide) >= en(narrow),
        s"8192-bucket selection must not regress seed enrichment: ${en(wide)} vs ${en(narrow)}")
    }
  }

  test("DSIR 8k width strictly improves enrichment when 256 buckets alias " +
      "seed and junk vocabulary") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.TextOps
    // Hunt a deterministic hash collision: a seed word u and a junk word v
    // that share a 256-bucket but not an 8192-bucket — the aliasing the
    // paper's 10^4-bucket width exists to avoid.
    val letters = 'a' to 'z'
    val cands = (for (a <- letters; b <- letters; c <- letters) yield s"q$a$b$c").toSeq
    val hm = cands.toDF("w").select(col("w"),
        pmod(graft.functions.hash52(col("w")), lit(256L)).as("b256"),
        pmod(graft.functions.hash52(col("w")), lit(8192L)).as("b8k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val stopBuckets = Seq("the", "of").toDF("w")
      .select(pmod(graft.functions.hash52(col("w")), lit(256L)))
      .collect().map(_.getLong(0)).toSet
    val (u, v) = hm.groupBy(_._2).valuesIterator
      .filter(g => g.length >= 2 && !stopBuckets(g.head._2) &&
        g.map(_._3).distinct.length >= 2)
      .map(g => (g(0)._1, g.find(_._3 != g(0)._3).get._1))
      .next()
    val bU = hm.find(_._1 == u).get._2
    // background vocabulary and numeric filler: all OUTSIDE u's
    // 256-bucket, so only the junk word aliases into the seed bucket
    val bg = hm.filter(w => w._2 != bU && w._1 != v).map(_._1).take(256)
    val nums = (100 to 999).map(_.toString).toDF("w")
      .select(col("w"), pmod(graft.functions.hash52(col("w")), lit(256L)).as("b"))
      .collect().collect { case r if r.getLong(1) != bU => r.getString(0) }.take(6)
    // 32 docs → kept quartile = exactly 8 (scores tie only within a class):
    //  - 8 seed docs: 7/7 Gopher flags, 50/52 tokens in u's bucket
    //  - 8 junk docs: pure v (fails word-count + stopword rules) — EVERY
    //    token rides u's 256-bucket via the collision
    //  - 16 background docs: stopwords + ordinary words + numeric filler
    //    (fails word-count + alpha-ratio) — they pull the stopword
    //    buckets' importance DOWN, so a seed doc scores strictly below
    //    the undiluted all-aliased junk doc at 256 buckets
    val rows =
      (1L to 8L).map(i => (i, "srcA", ("the of " + (s"$u " * 50)).trim)) ++
      (11L to 18L).map(i => (i, "srcA", (s"$v " * (10 + (i % 5)).toInt).trim)) ++
      (21L to 36L).map(i => (i, "srcA", ("the of " +
        bg.slice(((i - 21) * 16).toInt, ((i - 21) * 16).toInt + 16).mkString(" ") +
        " " + nums.mkString(" "))))
    val corpus = rows.toDF("doc_id", "source", "text")
    val seedRel = T.dsirWt(corpus).select(col("doc_id"), col("tgt")).distinct()
    assert(seedRel.filter(col("tgt") === 1).count() == 8,
      "construction check: exactly the 8 u-docs are Gopher seeds")
    def en(sel: org.apache.spark.sql.DataFrame): Double = {
      val kept = sel.filter(col("dsir_keep") === 1).join(seedRel, "doc_id")
      kept.filter(col("tgt") === 1).count().toDouble / kept.count()
    }
    val e256 = en(T.importanceDsirOf(corpus, 256L))
    val e8k = en(T.importanceDsirOf(corpus, T.DsirBuckets8k))
    // at 256 buckets the junk docs ride the seed bucket's importance and
    // fill the kept quartile ahead of the stopword-diluted seeds; at 8192
    // the junk bucket is raw-only and scores far below the bar
    assert(e8k > e256,
      s"8192 buckets must strictly beat aliased 256 buckets: $e8k vs $e256")
  }

  test("fingerprint revert (A→B→A): retrain writes a FRESH generation, never " +
      "rewrites a directory a prior marker served") {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-revert").toString
    val dir = s"$base/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // Pin the table file's mtime so the SAME rows reproduce the SAME
    // fingerprint (name:len:mtime) — the revert scenario a config rollback
    // or snapshot restore produces in a long-lived store.
    def writeDocs(rows: Seq[(Long, String, String)], mtime: Long): Unit = {
      val tmp = s"$base/tmp"
      rows.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val target = java.nio.file.Paths.get(dir, "documents.parquet")
      java.nio.file.Files.move(part.toPath, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val stateA = Seq(
      (1L, "srcA", "alpha beta gamma delta epsilon zeta eta theta iota"),
      (10L, "src0", "probe text one two three four five six seven eight"))
    val stateB = Seq(
      (1L, "srcA", "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "srcB", "state b adds this corpus document to the index now"),
      (10L, "src0", "probe text one two three four five six seven eight"))
    val root = freshRoot("revert")
    AnnModels.withRoot(root) {
      writeDocs(stateA, 1000000000000L)
      val firstRows = rows(AnnModels.lshIndex(spark, dir))
      def gens(): Set[String] = {
        val idx = new java.io.File(root).listFiles()
          .find(_.getName.startsWith("lshidx-")).get
        idx.listFiles().filter(_.isDirectory).map(_.getName)
          .filter(_.startsWith("g-")).toSet
      }
      val genA = gens().head
      writeDocs(stateB, 2000000000000L)
      AnnModels.lshIndex(spark, dir).collect()
      // REVERT: byte-identical state A at the original mtime — same
      // fingerprint, so genName(fp) collides with the already-served genA.
      writeDocs(stateA, 1000000000000L)
      val reverted = AnnModels.lshIndex(spark, dir)
      assert(rows(reverted) == firstRows, "reverted corpus must serve state-A content")
      val served = reverted.inputFiles.head
      assert(!served.contains(s"/$genA/"),
        s"retrain reused previously-served generation $genA: $served")
      assert(gens().exists(_.startsWith(genA + "-")),
        s"fingerprint collision must suffix past the served name, got ${gens()}")
      assert(gens().size <= 2, s"store must stay bounded at two generations: ${gens()}")
    }
  }

  test("legacy pre-generational store entries are swept on first access") {
    val root = freshRoot("sweep")
    // a pre-r11 artifact: fingerprint-keyed dir gated by parquet _SUCCESS,
    // no _GRAFT_COMPLETE marker, no g-* generations — permanently orphaned
    // under the generational layout (ADVICE r11: retained garbage)
    val legacy = new java.io.File(root, "lm-0123456789abcdef")
    assert(legacy.mkdirs())
    java.nio.file.Files.write(new java.io.File(legacy, "_SUCCESS").toPath, Array[Byte]())
    java.nio.file.Files.write(new java.io.File(legacy, "part-00000.parquet").toPath,
      "stale".getBytes("UTF-8"))
    // a non-artifact directory must be left alone (defensive: the sweep
    // only touches names shaped like artifact keys)
    val bystander = new java.io.File(root, "user-notes")
    assert(bystander.mkdirs())
    AnnModels.withRoot(root) {
      AnnModels.ivfCentroids(spark, sf).collect()
      assert(!legacy.exists(), "legacy _SUCCESS-gated entry must be swept")
      assert(bystander.exists(), "non-key-shaped directories must survive the sweep")
      // the freshly-trained current-layout artifact must of course survive
      assert(new java.io.File(root).listFiles().exists(_.getName.startsWith("ivf-")))
    }
  }

  test("logistic margins: registry-served, bit-identical to inline, one " +
      "fit across the gate and build consumers") {
    AnnModels.withRoot(freshRoot("qlr")) {
      val t0 = AnnModels.lrMarginTrains
      val served = rows(graft.operators.TextOps.qualityLr(spark, sf))
      assert(AnnModels.lrMarginTrains == t0 + 1, "first access must fit")
      graft.SparkEntry.queries("pipeline_build_lr")(spark, sf).collect()
      assert(AnnModels.lrMarginTrains == t0 + 1,
        "the build consumer must serve the artifact, not refit")
      assert(served == rows(graft.operators.TextOps.qualityLrInline(spark, sf)),
        "served logistic margins diverge from inline")
    }
  }

  test("ivf assignment and semantic labels: registry-served, bit-identical " +
      "to inline, one training pass across all consumers") {
    AnnModels.withRoot(freshRoot("semserve")) {
      val (a0, l0) = (AnnModels.ivfAssignTrains, AnnModels.semanticLabelTrains)
      // consumers: the dedup pair, both narrow assignment readers, a sampler
      Dedup.semanticDedup(spark, sf).collect()
      Dedup.semanticDedupKeep(spark, sf).collect()
      Similarity.prototypePrune(spark, sf).collect()
      Similarity.annIvf(spark, sf).collect()
      assert(AnnModels.ivfAssignTrains == a0 + 1,
        s"expected ONE assignment pass, got ${AnnModels.ivfAssignTrains - a0}")
      assert(AnnModels.semanticLabelTrains == l0 + 1,
        s"expected ONE semantic labeling, got ${AnnModels.semanticLabelTrains - l0}")
      assert(rows(AnnModels.ivfAssign(spark, sf)) ==
        rows(Similarity.ivfAssignInline(spark, sf)),
        "served assignment diverges from inline")
      assert(rows(AnnModels.semanticLabels(spark, sf)) ==
        rows(Dedup.semanticLabInline(spark, sf)),
        "served semantic labels diverge from inline")
    }
  }

  test("hashed-ngram gate margins: registry-served, bit-identical to " +
      "inline, one fit per corpus state") {
    AnnModels.withRoot(freshRoot("ftserve")) {
      val t0 = AnnModels.ftMarginTrains
      val served = rows(graft.operators.TextOps.qualityFt(spark, sf))
      assert(AnnModels.ftMarginTrains == t0 + 1, "first access must fit")
      assert(rows(graft.operators.TextOps.qualityFt(spark, sf)) == served)
      assert(AnnModels.ftMarginTrains == t0 + 1,
        "second access must serve the artifact, not refit")
      assert(served == rows(graft.operators.TextOps.qualityFtInline(spark, sf)),
        "served hashed-ngram margins diverge from inline")
    }
  }

  test("hamming pairs + degenerate census: registry-served, bit-identical " +
      "to inline, ONE build per hash family across all consumers") {
    AnnModels.withRoot(freshRoot("hamserve")) {
      val (p0, d0) = (AnnModels.hammingPairTrains, AnnModels.hammingDegenTrains)
      // the three gated pairing queries + the CC-label consumers that
      // must ride the SAME served pair artifacts
      graft.operators.Dedup.simhashPairs(spark, sf).collect()
      graft.operators.Multimodal.phashPairs(spark, sf).collect()
      graft.operators.Multimodal.audioPairs(spark, sf).collect()
      graft.operators.Multimodal.audioDedup(spark, sf).collect()
      graft.operators.Multimodal.phashDedup(spark, sf).collect()
      assert(AnnModels.hammingPairTrains == p0 + 3,
        s"expected ONE pair build per hash family (sim/ph/au), got ${AnnModels.hammingPairTrains - p0}")
      assert(AnnModels.hammingDegenTrains == d0 + 3,
        s"expected ONE degenerate census per hash family, got ${AnnModels.hammingDegenTrains - d0}")
      assert(rows(graft.operators.Dedup.simhashPairs(spark, sf)) ==
        rows(graft.operators.Dedup.simhashPairsInline(spark, sf)),
        "served simhash pairs diverge from inline")
      assert(rows(graft.operators.Multimodal.audioPairs(spark, sf)) ==
        rows(graft.operators.Multimodal.audioPairsInline(spark, sf)),
        "served audio pairs diverge from inline")
      assert(rows(graft.operators.Multimodal.phashPairs(spark, sf)) ==
        rows(graft.operators.Multimodal.phashPairsInline(spark, sf)),
        "served phash pairs diverge from inline")
      assert(AnnModels.hammingPairTrains == p0 + 3,
        "re-reading the artifacts must not rebuild the pair relations")
    }
  }

  test("PQ corpus codes: registry-served, bit-identical to inline, ONE " +
      "encoding pass across the whole PQ family") {
    AnnModels.withRoot(freshRoot("pqcodes")) {
      val c0 = AnnModels.pqCodeTrains
      // all three PQ-family consumers: compressed scan, IVFADC, rerank
      Similarity.annPq(spark, sf).collect()
      Similarity.annIvfPq(spark, sf).collect()
      Similarity.annIvfPqRerank(spark, sf).collect()
      assert(AnnModels.pqCodeTrains == c0 + 1,
        s"expected ONE corpus encoding pass, got ${AnnModels.pqCodeTrains - c0}")
      assert(rows(AnnModels.pqCodes(spark, sf)) ==
        rows(Similarity.pqCodesInline(spark, sf)),
        "served PQ codes diverge from inline encoding")
      assert(AnnModels.pqCodeTrains == c0 + 1,
        "re-reading the artifact must not re-encode")
    }
  }

  test("alignment scores: registry-served, bit-identical to inline; an " +
      "embeddings-table edit alone retrains (two-table fingerprint)") {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-align").toString
    val dir = s"$base/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def cp(table: String): Unit = {
      val src = java.nio.file.Paths.get(sf, s"$table.parquet")
      java.nio.file.Files.copy(src, java.nio.file.Paths.get(dir, s"$table.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    cp("documents"); cp("embeddings")
    AnnModels.withRoot(freshRoot("align")) {
      val t0 = AnnModels.alignScoreTrains
      val served = rows(graft.operators.Multimodal.textAlign(spark, dir))
      assert(AnnModels.alignScoreTrains == t0 + 1, "first access must train")
      assert(served == rows(graft.operators.Multimodal.textAlignInline(spark, dir)),
        "served alignment scores diverge from inline")
      graft.SparkEntry.queries("pipeline_curate_aligned")(spark, dir).collect()
      assert(AnnModels.alignScoreTrains == t0 + 1,
        "the curation consumer must serve the artifact, not retrain")
      // touch ONLY the embeddings table: the documents fingerprint is
      // unchanged, but the artifact depends on both — must retrain
      val embFile = java.nio.file.Paths.get(dir, "embeddings.parquet")
      java.nio.file.Files.setLastModifiedTime(embFile,
        java.nio.file.attribute.FileTime.fromMillis(
          java.nio.file.Files.getLastModifiedTime(embFile).toMillis + 60000))
      graft.operators.Multimodal.textAlign(spark, dir).collect()
      assert(AnnModels.alignScoreTrains == t0 + 2,
        "an embeddings-only edit must invalidate the alignment artifact")
    }
  }

  test("funnel flags: registry-served, bit-identical to inline, ONE build " +
      "across both funnel queries") {
    AnnModels.withRoot(freshRoot("funfl")) {
      val b0 = AnnModels.funnelFlagBuilds
      graft.operators.Pipeline.funnel(spark, sf).collect()
      graft.operators.Pipeline.funnelSource(spark, sf).collect()
      assert(AnnModels.funnelFlagBuilds == b0 + 1,
        s"expected ONE flag build across both funnels, got ${AnnModels.funnelFlagBuilds - b0}")
      assert(rows(AnnModels.funnelFlags(spark, sf)) ==
        rows(graft.operators.Pipeline.funnelFlagsInline(spark, sf)),
        "served funnel flags diverge from the inline build")
      assert(AnnModels.funnelFlagBuilds == b0 + 1,
        "re-reading the artifact must not rebuild the flags")
    }
  }

  test("langid + quality score relations: registry-served, bit-identical " +
      "to inline, ONE text scan each across the whole curate battery") {
    AnnModels.withRoot(freshRoot("scores")) {
      val (l0, q0) = (AnnModels.langidScoreBuilds, AnnModels.qualityScoreBuilds)
      // the heaviest per-invocation consumers: three curate variants +
      // both funnels + the gated scoring queries themselves
      graft.operators.TextOps.langid(spark, sf).collect()
      graft.operators.TextOps.quality(spark, sf).collect()
      graft.operators.Pipeline.curate(spark, sf).collect()
      graft.operators.Pipeline.curateNearDup(spark, sf).collect()
      graft.operators.Pipeline.funnel(spark, sf).collect()
      assert(AnnModels.langidScoreBuilds == l0 + 1,
        s"expected ONE langid scan, got ${AnnModels.langidScoreBuilds - l0}")
      assert(AnnModels.qualityScoreBuilds == q0 + 1,
        s"expected ONE quality scan, got ${AnnModels.qualityScoreBuilds - q0}")
      assert(rows(graft.operators.TextOps.langid(spark, sf)) ==
        rows(graft.operators.TextOps.langidInline(spark, sf)),
        "served langid predictions diverge from inline")
      assert(rows(graft.operators.TextOps.quality(spark, sf)) ==
        rows(graft.operators.TextOps.qualityInline(spark, sf)),
        "served quality scores diverge from inline")
      assert(AnnModels.langidScoreBuilds == l0 + 1 &&
        AnnModels.qualityScoreBuilds == q0 + 1,
        "re-reads must not re-scan")
    }
  }

  test("knn graph: registry-served, bit-identical to inline, ONE build " +
      "per corpus state") {
    AnnModels.withRoot(freshRoot("knng")) {
      val b0 = AnnModels.knnGraphBuilds
      val served = rows(Similarity.knnGraph(spark, sf))
      assert(AnnModels.knnGraphBuilds == b0 + 1, "first access must build")
      assert(rows(Similarity.knnGraph(spark, sf)) == served)
      assert(AnnModels.knnGraphBuilds == b0 + 1,
        "second access must serve the artifact, not rebuild")
      assert(served == rows(Similarity.knnGraphInline(spark, sf)),
        "served knn graph diverges from the inline build")
    }
  }

  test("production-budget unigram vocabulary: own key, ONE train, " +
      "coexists with the toy budget") {
    AnnModels.withRoot(freshRoot("unibig")) {
      val (t0, b0) = (AnnModels.uniTrains, AnnModels.uniBigTrains)
      val big = rows(graft.operators.UnigramLm.unigramVocabBig(spark, sf))
      assert(AnnModels.uniBigTrains == b0 + 1, "first access must train")
      graft.operators.UnigramLm.unigramIdsBig(spark, sf).count()
      assert(AnnModels.uniBigTrains == b0 + 1,
        "the id consumer must serve the artifact, not retrain")
      // the toy-budget artifact is a DIFFERENT key: reading it trains the
      // small model without touching the big one
      graft.operators.UnigramLm.unigramVocab(spark, sf).count()
      assert(AnnModels.uniTrains == t0 + 1 && AnnModels.uniBigTrains == b0 + 1,
        "the two budgets must live under distinct keys")
      assert(big == rows(graft.operators.UnigramLm.uniTrainOf(
          graft.sources.Tables.load(spark, sf, "documents"),
          graft.operators.UnigramLm.UniSeedVocabBig,
          graft.operators.UnigramLm.UniVocabBig,
          graft.operators.UnigramLm.UniItersBig)),
        "served production-budget vocabulary diverges from inline training")
    }
  }

  test("ivfK follows an in-place embeddings edit across a sizing boundary " +
      "(fingerprint-keyed memo, ADVICE r15)") {
    val sp = spark
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfk").toString
    def gen(n: Long): Unit = sp.range(0, n).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)),
          d => (d % 3).cast("float")).as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    gen(100)
    assert(Similarity.ivfK(spark, dir) == Similarity.NumCentroids,
      "small corpus must sit on the K floor")
    // same dir, same session: the memo used to pin the old K here, so the
    // registry keys (which embed K) and the oracle (which derives K from
    // the live corpus) would silently disagree after the edit
    gen(4096)
    assert(Similarity.ivfK(spark, dir) == 12, // ceil(sqrt(4096/32))
      "an in-place corpus edit crossing a sizing boundary must re-derive K")
  }

  test("sweep spares key-shaped dirs without old-layout evidence") {
    val root = freshRoot("sweep2")
    // the two shapes the absence-only predicate would have destroyed
    // (ADVICE r12): a second writer mid-FIRST-train — key dir created,
    // first g-* generation not yet written — and a foreign directory
    // that happens to match the key pattern in a shared model dir
    val midTrain = new java.io.File(root, "lm-feedfacefeedface")
    assert(midTrain.mkdirs())
    val foreign = new java.io.File(root, "backup-0123456789ab")
    assert(foreign.mkdirs())
    java.nio.file.Files.write(new java.io.File(foreign, "data.bin").toPath,
      "not ours".getBytes("UTF-8"))
    AnnModels.withRoot(root) {
      AnnModels.ivfCentroids(spark, sf).collect()
      assert(midTrain.exists(),
        "a marker-less, generation-less, _SUCCESS-less key dir must survive the sweep")
      assert(foreign.exists(), "foreign key-shaped dirs without old-layout markers must survive")
    }
  }

  test("marker commit is atomic (rename), and a marker naming a missing " +
      "generation falls back to retrain instead of serving a dead path") {
    val root = freshRoot("atomic")
    AnnModels.withRoot(root) {
      val first = rows(AnnModels.ivfCentroids(spark, sf))
      val key = new java.io.File(root).listFiles().find(_.getName.startsWith("ivf-")).get
      // rename-based commit leaves no temp residue next to the marker
      assert(!new java.io.File(key, "_GRAFT_COMPLETE.tmp").exists(),
        "commit must rename the temp marker into place, not leave it behind")
      val marker = new java.io.File(key, "_GRAFT_COMPLETE")
      assert(marker.exists())
      // Simulate the torn-read / stale-marker aftermath the atomic rename
      // prevents going FORWARD, for stores written by the in-place-write
      // code: fp line intact, generation line pointing at a collected dir.
      val fp = new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
        .split("\n")(0)
      java.nio.file.Files.write(marker.toPath,
        s"$fp\ng-deadbeefdeadbeef".getBytes("UTF-8"))
      // the raw write above bypasses Hadoop's ChecksumFileSystem — drop the
      // stale sidecar so the tampered marker is readable, as a plain-FS
      // writer's would be
      new java.io.File(key, "._GRAFT_COMPLETE.crc").delete()
      val again = AnnModels.ivfCentroids(spark, sf)
      assert(rows(again) == first,
        "a marker naming a missing generation must retrain, not serve a dead path")
      again.collect() // the served path must actually be readable
    }
  }

  test("non-default training parameters bypass the artifact store") {
    AnnModels.withRoot(freshRoot("bypass")) {
      val t0 = AnnModels.ivfTrains
      // iters=0 (the untrained-init recall baseline) must not read or
      // write the default-keyed artifact
      Similarity.annIvfIters(spark, sf, 0).collect()
      assert(AnnModels.ivfTrains == t0, "non-default variant touched the registry")
    }
  }

  // --- r16 optimization round: the five new served relations ---------------

  test("minhash candidate pairs build once; served pairs are bit-identical " +
      "to the inline LSH chain and feed the CC labeling without a rebuild") {
    AnnModels.withRoot(freshRoot("mhcand")) {
      val (c0, l0) = (AnnModels.candPairBuilds, AnnModels.candLabelBuilds)
      val served = rows(Dedup.minhashLsh(spark, sf))
      assert(AnnModels.candPairBuilds == c0 + 1, "first access must build")
      assert(served == rows(Dedup.minhashLshInline(spark, sf)),
        "artifact-served candidate pairs diverged from the inline LSH chain")
      assert(served.nonEmpty, "construction check: the corpus has candidates")
      // every minhash-family consumer rides the ONE pair build
      Dedup.weightedJaccard(spark, sf).collect()
      Dedup.minhashEstimate(spark, sf).collect()
      val labels = rows(Dedup.clusterAssign(spark, sf))
      assert(AnnModels.candPairBuilds == c0 + 1,
        s"expected ONE candidate build across consumers, got ${AnnModels.candPairBuilds - c0}")
      assert(AnnModels.candLabelBuilds == l0 + 1, "labels must build once")
      assert(labels == rows(Dedup.clusterAssignInline(spark, sf)),
        "artifact-served CC labeling diverged from the inline star loop")
      assert(AnnModels.candLabelBuilds == l0 + 1,
        "the inline parity run must not write the registry")
    }
  }

  test("gopher flags, contamination hits and calibrated keeps: " +
      "registry-served, bit-identical to inline, one build each") {
    AnnModels.withRoot(freshRoot("curation")) {
      val T = graft.operators.TextOps
      val P = graft.operators.Pipeline
      val (g0, d0, k0) = (AnnModels.gopherFlagBuilds, AnnModels.dirtyGramBuilds,
        AnnModels.calibKeepBuilds)
      assert(rows(T.gopherRules(spark, sf)) == rows(T.gopherRulesInline(spark, sf)),
        "artifact-served gopher flags diverged from the inline battery")
      assert(rows(P.decontaminate(spark, sf)) == rows(P.decontaminateInline(spark, sf)),
        "artifact-served contamination hits diverged from the inline explode")
      assert(rows(T.qualityCalibrated(spark, sf)) ==
        rows(T.qualityCalibratedOf(T.qualityModel(spark, sf))),
        "artifact-served calibrated keeps diverged from the inline census")
      // the build capstone reads all three — no rebuild on a second pass
      P.build(spark, sf).collect()
      P.buildCalibrated(spark, sf).collect()
      assert(AnnModels.gopherFlagBuilds == g0 + 1,
        s"expected ONE gopher build, got ${AnnModels.gopherFlagBuilds - g0}")
      assert(AnnModels.dirtyGramBuilds == d0 + 1,
        s"expected ONE contamination build, got ${AnnModels.dirtyGramBuilds - d0}")
      assert(AnnModels.calibKeepBuilds == k0 + 1,
        s"expected ONE calibrated build, got ${AnnModels.calibKeepBuilds - k0}")
    }
  }
}
