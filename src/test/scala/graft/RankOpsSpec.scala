package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Pipeline, TextOps}

/** Semantics of the two-level-rank family added in round 8: curriculum
  * ordering (tiered permutation) and exact distributed quantiles — each
  * checked against a brute-force driver-side re-derivation at sf0.001.
  */
class RankOpsSpec extends SparkSpec {

  test("curriculum is a dense permutation ordered head < middle < tail") {
    val rows = Pipeline.curriculum(spark, sf)
      .select(col("doc_id"), col("ppl_bucket"), col("curriculum_pos"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_._3).sorted.toSeq == (0L until n).toSeq,
      "positions must be a dense 0..n-1 permutation")
    // tier blocks are contiguous: every head position < every middle
    // position < every tail position
    def posOf(b: String) = rows.filter(_._2 == b).map(_._3)
    val (h, m, t) = (posOf("head"), posOf("middle"), posOf("tail"))
    assert(h.nonEmpty && m.nonEmpty && t.nonEmpty, "all three tiers populated")
    assert(h.max < m.min && m.max < t.min, "tiers must stream in order")
  }

  test("curriculum within-tier order is the md5 permutation") {
    val got = Pipeline.curriculum(spark, sf)
      .join(graft.sources.Tables.load(spark, sf, "documents").select(col("doc_id")), Seq("doc_id"))
      .select(col("doc_id"), col("ppl_bucket"), col("curriculum_pos"),
        graft.functions.hash64(col("doc_id")).as("h"))
      .collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(0), r.getLong(2)))
    got.groupBy(_._1).foreach { case (_, tierRows) =>
      val byPos = tierRows.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      val byHash = tierRows.sortBy(r => (r._2, r._3)).map(r => (r._2, r._3)).toSeq
      assert(byPos == byHash, "within a tier, position order must equal (hash, doc_id) order")
    }
  }

  test("interleave is a dense permutation that spreads sources evenly") {
    val rows = Pipeline.interleave(spark, sf)
      .select(col("doc_id"), col("source"), col("r"), col("interleave_pos"))
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    val n = rows.length
    assert(rows.map(_._4).sorted.toSeq == (0L until n).toSeq, "dense 0..n-1 permutation")
    // per-source: stream order preserves the in-source md5 rank
    rows.groupBy(_._2).foreach { case (_, g) =>
      val byPos = g.sortBy(_._4).map(_._3).toSeq
      assert(byPos == byPos.sorted, "within a source, r must increase along the stream")
    }
    // the shipped corpus has equal-share sources: the interleave must be an
    // exact round-robin — each block of |sources| positions hits every source
    val nSrc = rows.map(_._2).distinct.length
    val firstBlock = rows.filter(_._4 < nSrc).map(_._2).distinct
    assert(firstBlock.length == nSrc,
      s"equal shares must round-robin: first $nSrc positions hit ${firstBlock.length} sources")
  }

  test("dataset build manifest conserves the composed standalone gates") {
    val ss = SparkSpec.spark
    val flags = Pipeline.BuildGopherFlags
    val gopher = TextOps.gopherRules(spark, sf)
      .filter(flags.map(col(_) === 1).reduce(_ && _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val model = TextOps.qualityModel(spark, sf).filter(col("model_keep") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val canon = graft.operators.Dedup.survivors(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dirty = Pipeline.decontaminate(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectIds = docs.keySet
      .filter(id => id >= 10 && gopher(id) && model(id) && canon(id) && !dirty(id))
    val manifest = Pipeline.build(spark, sf)
      .agg(sum(col("n_docs")), sum(col("n_tokens"))).head()
    assert(manifest.getLong(0) == expectIds.size,
      s"manifest docs ${manifest.getLong(0)} != composed gates ${expectIds.size}")
    assert(manifest.getLong(1) == expectIds.toSeq.map(docs).sum,
      "manifest token total must equal the survivors' token sum")
    assert(expectIds.nonEmpty, "the composed gates must keep a non-degenerate survivor set")
  }

  test("equi-depth deciles match a brute-force sort") {
    val got = Analytics.equidepthHist(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val vals = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = vals.length.toLong
    assert(got.map(_._1).toSeq == (1 to 10).toSeq, "one row per decile")
    got.foreach { case (q, boundary, target, nOut) =>
      assert(nOut == n)
      val expectTarget = (q * n + 9) / 10
      assert(target == expectTarget, s"decile $q target rank")
      assert(boundary == vals((expectTarget - 1).toInt),
        s"decile $q boundary must be the rank-$expectTarget value")
    }
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq, "boundaries nondecreasing")
    assert(got.last._2 == vals.last, "decile 10 is the maximum")
  }

  test("equi-depth blocks derive from the data's own bounds (skewed domain)") {
    val sp = spark
    import sp.implicits._
    // 10k distinct values all inside [0, 10): the pre-round-9 fixed absolute
    // width (floor(v/1000)) would land EVERY value in one block, degenerating
    // the within-block window toward a global sort. The min/max-derived
    // width must both (a) keep the decile answer exact and (b) spread the
    // domain over many bounded blocks.
    val raw = (0 until 10000).map(i => i.toDouble / 1000)
    val got = Analytics.equidepthOf(raw.toDF("v")).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val sorted = raw.sorted
    assert(got.map(_._1).toSeq == (1 to 10).toSeq, "one row per decile")
    got.foreach { case (q, b, target, n) =>
      assert(n == 10000L)
      assert(target == (q * 10000L + 9) / 10)
      assert(b == sorted((target - 1).toInt), s"decile $q boundary")
    }
    // the block scheme itself (same formula the operator plants): bounded
    // per-block distinct values, spread over many blocks
    val w = (sorted.last - sorted.head) / Analytics.EquidepthBlocks
    val perBlk = sorted.distinct
      .groupBy(v => math.floor((v - sorted.head) / w).toLong).values.map(_.size)
    assert(perBlk.max <= 8, s"per-block distinct values must stay bounded, got ${perBlk.max}")
    assert(perBlk.size > 1000, s"skewed domain must spread over many blocks, got ${perBlk.size}")
  }

  test("census survives a value domain wider than Long.MaxValue") {
    val sp = spark
    import sp.implicits._
    // v - vmin overflows a long when the domain spans both extreme signs
    // (e.g. fixed-point logit8 outliers): the block id must come from
    // double-space subtraction or the census goes non-monotone and the
    // calibrated threshold with it. Deciles over the full signed range.
    val raw: Seq[Long] = Seq(Long.MinValue, Long.MinValue + 7, -1L, 0L, 1L,
      42L, 1000L, Long.MaxValue - 3, Long.MaxValue) ++ (1L to 11L).map(_ * 1001L)
    val sorted = raw.sorted
    val n = raw.length.toLong
    val got = Analytics.equidepthOf(raw.toDF("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (1 to 10).toSeq, s"one row per decile: ${got.toSeq}")
    got.foreach { case (q, b, target, nOut) =>
      assert(nOut == n)
      assert(target == (q * n + 9) / 10)
      assert(b == sorted((target - 1).toInt), s"decile $q boundary")
    }
  }
}
