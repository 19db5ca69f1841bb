package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decodeStub is deterministic and bounded") {
    val a = Multimodal.Asset(7L, "hello world".getBytes("UTF-8"))
    val m1 = Multimodal.decodeStub(a)
    val m2 = Multimodal.decodeStub(a)
    assert(m1 == m2)
    assert(m1.width >= 16 && m1.width < 640 && m1.height >= 16 && m1.height < 480)
    assert(m1.n_bytes == 11 && m1.channels == 3)
  }

  test("mm_decode covers every document exactly once") {
    val n = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(Multimodal.decode(spark, sf).count() == n)
  }

  test("mm_decode real-codec branch parses an actual PNG through javax.imageio") {
    // A REAL container decode with zero new dependencies: render a tiny
    // deterministic image, encode it as PNG with the JDK's own writer, and
    // push it through the same partition-parallel decode path the gated
    // query runs. Non-PNG payloads must keep taking the arithmetic stub.
    val img = new java.awt.image.BufferedImage(37, 21,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 37; y <- 0 until 21)
      img.setRGB(x, y, (x * 31 + y * 7) % 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK PNG writer unavailable")
    val png = bos.toByteArray
    val textPayload = "plain text payload".getBytes("UTF-8")
    val sp = spark
    import sp.implicits._
    val ds = Seq(Multimodal.Asset(1L, png), Multimodal.Asset(2L, textPayload)).toDS()
    val got = Multimodal.decodeAssets(ds).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap
    // the PNG decodes to its REAL pixel geometry, not stub arithmetic
    assert(got(1L) == ((png.length, 37, 21, 3, 1)), s"real decode wrong: ${got(1L)}")
    // the text payload still routes through the stub branch
    val stub = Multimodal.decodeStub(Multimodal.Asset(2L, textPayload))
    assert(got(2L) == ((stub.n_bytes, stub.width, stub.height, stub.channels, stub.n_frames)),
      s"stub branch diverged: ${got(2L)}")
  }

  test("mm_frame_sample emits at most 4 frames per asset with 32-hex fingerprints") {
    val df = Multimodal.frameSample(spark, sf)
    import org.apache.spark.sql.functions._
    val maxFrames = df.groupBy("doc_id").count().agg(max("count")).collect().head.getLong(0)
    assert(maxFrames <= 4)
    assert(df.filter(not(col("frame_md5").rlike("^[0-9a-f]{32}$"))).count() == 0)
  }

  test("mm_phash matches an independent segment-mean computation and collides on identical payloads") {
    // Independent recomputation (plain byte arithmetic, no Spark) over the
    // real corpus — the same cross-check style as the simhash bit-vote spec.
    def ref(payload: Array[Byte]): Long = {
      val n = payload.length
      val total = payload.map(b => (b & 0xff).toLong).sum
      (0 until 64).foldLeft(0L) { (h, j) =>
        val lo = ((j.toLong * n) / 64).toInt; val hi = (((j + 1).toLong * n) / 64).toInt
        val seg = payload.slice(lo, hi).map(b => (b & 0xff).toLong).sum
        // BigInt: the independent mirror of the engine's 128-bit compare
        if (BigInt(seg) * n > BigInt(total) * (hi - lo)) h | (1L << j) else h
      }
    }
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Multimodal.phash(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got.keySet == texts.keySet)
    got.foreach { case (id, (nb, h)) =>
      val bytes = texts(id).getBytes("UTF-8")
      assert(nb == bytes.length)
      assert(h == ref(bytes), s"phash mismatch for doc $id")
    }
    // identical payloads collide exactly
    assert(Multimodal.phashStub(Multimodal.Asset(1L, "same bytes".getBytes)) ._3 ==
      Multimodal.phashStub(Multimodal.Asset(2L, "same bytes".getBytes))._3)
  }

  test("a corrupt payload carrying the PNG signature falls back to the stub, never NPEs") {
    // real crawled data contains truncated/corrupt files whose first 8
    // bytes still match the signature — every real-branch consumer must
    // degrade to the byte stub, not kill the task
    val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val a = Multimodal.Asset(7L, magic ++ "not actually a png at all".getBytes("UTF-8"))
    assert(Multimodal.decodeAsset(a) == Multimodal.decodeStub(a))
    assert(Multimodal.phashAsset(a) == Multimodal.phashStub(a))
    assert(Multimodal.resampleAsset(a) == Multimodal.resampleStub(a))
  }

  test("pixel-domain phash is invariant to re-encoding; the byte stub is not") {
    import java.awt.image.BufferedImage
    def toPng(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK PNG writer unavailable")
      bos.toByteArray
    }
    // deterministic gradient: column-dependent gray so cell means differ
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = (x * 4) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val png1 = toPng(img)
    // SAME pixels through a different encoder path (ARGB color type):
    // different PNG bytes, identical decoded image
    val argb = new BufferedImage(64, 48, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 48; x <- 0 until 64) argb.setRGB(x, y, 0xff000000 | img.getRGB(x, y))
    val png2 = toPng(argb)
    assert(!java.util.Arrays.equals(png1, png2), "re-encode must change the container bytes")
    val h1 = Multimodal.phashAsset(Multimodal.Asset(1L, png1))._3
    val h2 = Multimodal.phashAsset(Multimodal.Asset(2L, png2))._3
    assert(h1 == h2, "pixel-domain phash must collide across re-encodings of the same image")
    assert(h1 != 0L && h1 != -1L, "hash must be nondegenerate on a gradient")
    // the byte-domain stub DOES diverge across the two encodings — the
    // image-dedup defect the pixel branch exists to fix
    assert(Multimodal.phashStub(Multimodal.Asset(1L, png1))._3 !=
      Multimodal.phashStub(Multimodal.Asset(2L, png2))._3,
      "byte segmentation should differ across encodings (else this spec proves nothing)")
    // a genuinely different image (inverted gradient) lands far away
    val inv = new BufferedImage(64, 48, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = 255 - ((x * 4) % 256)
      inv.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val h3 = Multimodal.phashAsset(Multimodal.Asset(3L, toPng(inv)))._3
    assert(java.lang.Long.bitCount(h1 ^ h3) > 8,
      s"inverted image must be hamming-far, got ${java.lang.Long.bitCount(h1 ^ h3)}")
  }

  test("pixel resample pools exact block means and survives re-encoding") {
    import java.awt.image.BufferedImage
    // four constant 2x2 gray blocks -> pooling to 2x2 must yield the exact
    // block values (gray pixel: luminance = (299+587+114)*v/1000 = v)
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_3BYTE_BGR)
    val blocks = Array(Array(10, 200), Array(90, 250))
    for (y <- 0 until 4; x <- 0 until 4) {
      val v = blocks(y / 2)(x / 2)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val pooled = Multimodal.poolLuminance(img, 2, 2).map(_ & 0xff)
    assert(pooled.toSeq == Seq(10, 200, 90, 250), s"pooled: ${pooled.toSeq}")
    // the dispatch: same pixels through two PNG encoders -> same fingerprint
    def toPng(im: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "png", bos))
      bos.toByteArray
    }
    val argb = new BufferedImage(4, 4, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 4; x <- 0 until 4) argb.setRGB(x, y, 0xff000000 | img.getRGB(x, y))
    val r1 = Multimodal.resampleAsset(Multimodal.Asset(1L, toPng(img)))
    val r2 = Multimodal.resampleAsset(Multimodal.Asset(2L, toPng(argb)))
    assert(r1._4 == r2._4, "pixel resample must collide across re-encodings")
    assert((r1._2, r1._3) == ((4, 4)), "within-bounds image passes through")
    // scalar outDims mirrors the resizePlan column arithmetic exactly
    val plan = Multimodal.resizePlan(spark, sf).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> ((r.getInt(3), r.getInt(4)))).toMap
    plan.foreach { case ((w, h), out) =>
      assert(Multimodal.outDims(w, h) == out, s"outDims($w,$h) diverges from resizePlan")
    }
  }

  test("mm_phash_pairs pairs identical payloads at hamming 0 and skips disjoint ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_phash").toString
    val s = spark
    import s.implicits._
    Seq(
      (1L, "src0", "the same asset bytes exactly as shipped by the upstream crawler"),
      (2L, "src0", "the same asset bytes exactly as shipped by the upstream crawler"),
      (3L, "src0", "zq zz qz xx completely different content with other byte structure"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.phashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((1L, 2L, 0)), s"identical payloads must pair at hamming 0: $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      s"disjoint payload must not pair: $got")
  }

  test("audio fingerprint matches an independent band-energy recompute; PCM re-containering is invariant") {
    // Byte-path recompute, independent loop over the raw UTF-8 payloads.
    val fps = Multimodal.audioFingerprint(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8"))
    assert(texts.nonEmpty && fps.size == texts.length)
    texts.foreach { case (id, bytes) =>
      val starts = (0 until math.max(bytes.length - 255, 1) by 128).take(8)
      var fp = 0L
      starts.zipWithIndex.foreach { case (st, w) =>
        val len = math.min(st + 256, bytes.length) - st
        val subs = (0 until 8).map { b =>
          (st + b * len / 8 until st + (b + 1) * len / 8).map { i =>
            val c = ((bytes(i) & 0xff) - 128).toLong; c * c
          }.sum
        }
        val tot = subs.sum
        (0 until 8).foreach(j => if (subs(j) * 8 > tot) fp |= 1L << (w * 8 + j))
      }
      assert(fps(id) == ((fp, starts.length)), s"doc $id fingerprint diverged")
    }
    // The 8·S > E bit rule is SCALE-FREE: the same PCM re-containered
    // big-endian decodes to identical samples, so the fingerprint is
    // bit-identical — the property that makes this a PERCEPTUAL id where
    // the byte-domain phash stub is container-sensitive.
    import javax.sound.sampled._
    val samples = Array.tabulate(700)(i => ((i * 37 + 11) % 4001 - 2000).toShort)
    def wavBytes(bigEndian: Boolean): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        val v = samples(i).toInt
        if (bigEndian) { bytes(2 * i) = (v >> 8).toByte; bytes(2 * i + 1) = v.toByte }
        else { bytes(2 * i) = v.toByte; bytes(2 * i + 1) = (v >> 8).toByte }
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, bigEndian)
      val in = new AudioInputStream(new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val le = Multimodal.audioFingerprintOf(Multimodal.Asset(9L, wavBytes(bigEndian = false)))
    val be = Multimodal.audioFingerprintOf(Multimodal.Asset(9L, wavBytes(bigEndian = true)))
    assert(le == be, "container endianness must not change the fingerprint")
    assert(le._3 == (0 until (700 - 256 + 1) by 128).take(8).length,
      "window count must follow the audioWindows grid")
  }

  test("mm_audio_pairs pairs identical payloads at hamming 0 and skips disjoint ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_afp").toString
    val s = spark
    import s.implicits._
    Seq(
      (1L, "src0", "the same asset bytes exactly as shipped by the upstream crawler"),
      (2L, "src0", "the same asset bytes exactly as shipped by the upstream crawler"),
      (3L, "src0", "zq zz qz xx completely different content with other byte structure"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.audioPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((1L, 2L, 0)), s"identical payloads must pair at hamming 0: $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      s"disjoint payload must not pair: $got")
  }

  test("mm_audio_dedup/keep match a brute-force CC reference; keep takes the longest recording") {
    val dir = java.nio.file.Files.createTempDirectory("graft_audedup").toString
    val s = spark
    import s.implicits._
    val same = "pcm payload bytes travel twice around the block " * 20
    Seq(
      (1L, "src0", same), (2L, "src0", same),
      (7L, "src0", "a" * 600), (8L, "src0", "a" * 1200),
      (9L, "src0", ("low " * 50) + ("HIGH!!! " * 100)))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // brute-force reference: fingerprints -> hamming<=bar pairs -> CC
    val fps = Multimodal.audioFingerprint(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = fps.map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for { (a, ha, _) <- fps; (b, hb, _) <- fps if a < b
          if java.lang.Long.bitCount(ha ^ hb) <= graft.operators.Dedup.MaxHamming } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clusters = ids.groupBy(find)
    assert(find(2L) == find(1L) && clusters.size < ids.length,
      "fixture must exercise a non-trivial merge")
    val expDedup = clusters.map { case (c, ms) => c -> ms.length.toLong }
    val gotDedup = Multimodal.audioDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDedup == expDedup, s"dedup diverges from reference: $gotDedup vs $expDedup")
    val wins = fps.map(f => f._1 -> f._3).toMap
    val expKeep = clusters.map { case (_, ms) =>
      val best = ms.minBy(m => (-wins(m), m))
      best -> ((wins(best), ms.length.toLong))
    }
    val gotKeep = Multimodal.audioKeep(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(gotKeep == expKeep, s"keep diverges from reference: $gotKeep vs $expKeep")
    // the discriminating case: if the constant-byte pair merged, the
    // LONGER recording must be its survivor
    if (find(7L) == find(8L))
      assert(gotKeep.contains(8L) && !gotKeep.contains(7L),
        s"doc 8 (more windows) must beat doc 7: $gotKeep")
  }

  test("mm_resize preserves bounds: long side capped, nothing upscaled, patch grid exact") {
    import org.apache.spark.sql.functions._
    val df = Multimodal.resizePlan(spark, sf)
    assert(df.filter(
      greatest(col("out_w"), col("out_h")) > Multimodal.MaxSide ||
        col("out_w") < 1 || col("out_h") < 1 ||
        col("out_w") > col("src_w") || col("out_h") > col("src_h")).count() == 0,
      "resize must never upscale and must cap the long side")
    assert(df.filter(col("n_patches") =!=
      (ceil(col("out_w") / Multimodal.Patch) * ceil(col("out_h") / Multimodal.Patch)).cast("int")).count() == 0)
  }

  test("bulk luminance plane matches per-pixel getRGB across raster layouts") {
    import java.awt.image.BufferedImage
    // the reference semantics the bulk paths must preserve: per-pixel getRGB
    def referenceHash(img: BufferedImage): Long = {
      val w = img.getWidth; val h = img.getHeight
      val cellSum = new Array[Long](64); val cellPix = new Array[Long](64)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val lum = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
        val c = math.min(y * 8 / h, 7) * 8 + math.min(x * 8 / w, 7)
        cellSum(c) += lum; cellPix(c) += 1
      }
      val total = cellSum.sum; val totPix = cellPix.sum
      (0 until 64).foldLeft(0L) { (acc, j) =>
        if (cellPix(j) > 0 &&
            (BigInt(cellSum(j)) * totPix > BigInt(total) * cellPix(j))) acc | (1L << j)
        else acc
      }
    }
    val types = Seq(
      "3BYTE_BGR" -> BufferedImage.TYPE_3BYTE_BGR,   // packed raw-raster fast path
      "4BYTE_ABGR" -> BufferedImage.TYPE_4BYTE_ABGR, // packed fast path with alpha lead
      "INT_RGB" -> BufferedImage.TYPE_INT_RGB,       // bulk getRGB path
      "BYTE_GRAY" -> BufferedImage.TYPE_BYTE_GRAY)   // bulk path WITH color conversion
    types.foreach { case (name, t) =>
      val img = new BufferedImage(41, 23, t)
      val g = img.createGraphics()
      for (y <- 0 until 23; x <- 0 until 41) {
        g.setColor(new java.awt.Color((x * 29 + y * 7) % 256, (x * 13) % 256, (y * 31) % 256))
        g.fillRect(x, y, 1, 1)
      }
      g.dispose()
      assert(Multimodal.phashPixels(img) == referenceHash(img),
        s"bulk luminance diverged from per-pixel getRGB on $name")
      // pooling parity on the same plane: exact block means of getRGB luminance
      val pooled = Multimodal.poolLuminance(img, 5, 3)
      for (oy <- 0 until 3; ox <- 0 until 5) {
        val y0 = oy * 23 / 3; val y1 = math.max((oy + 1) * 23 / 3, y0 + 1)
        val x0 = ox * 41 / 5; val x1 = math.max((ox + 1) * 41 / 5, x0 + 1)
        var sum = 0L
        for (y <- y0 until y1; x <- x0 until x1) {
          val rgb = img.getRGB(x, y)
          sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
        }
        val expect = (sum / ((y1 - y0).toLong * (x1 - x0) * 1000L)).toByte
        assert(pooled(oy * 5 + ox) == expect, s"pool cell ($ox,$oy) diverged on $name")
      }
    }
  }

  test("real WAV branch: windows decoded PCM samples, degrades on corrupt RIFF") {
    import javax.sound.sampled._
    // deterministic 16-bit signed little-endian mono PCM, 700 samples
    val samples = Array.tabulate(700)(i => ((i * 37 + 11) % 4001 - 2000).toShort)
    def wavBytes(bigEndian: Boolean): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        val v = samples(i).toInt
        if (bigEndian) { bytes(2 * i) = (v >> 8).toByte; bytes(2 * i + 1) = v.toByte }
        else { bytes(2 * i) = v.toByte; bytes(2 * i + 1) = (v >> 8).toByte }
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, bigEndian)
      val in = new AudioInputStream(new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val wav = wavBytes(bigEndian = false)
    assert(wav.take(4).sameElements("RIFF".getBytes("US-ASCII")), "generated file must be RIFF")
    val rows = Multimodal.audioWindowsOf(Multimodal.Asset(3L, wav))
    // expected: hand-computed energies over the DECODED samples (windows of
    // 256 samples, hop 128) — proves the branch reads PCM, not container bytes
    val expected = (0 until (700 - 256 + 1) by 128).take(8).map { st =>
      val end = math.min(st + 256, 700)
      (3L, st / 128, end - st, (st until end).map(i => samples(i).toLong * samples(i)).sum)
    }
    assert(rows == expected, s"WAV windows must cover decoded samples: $rows")
    // container-variant invariance: the same PCM written big-endian decodes
    // to the same sample values, so energies are identical
    assert(Multimodal.audioWindowsOf(Multimodal.Asset(3L, wavBytes(bigEndian = true))) == expected,
      "endianness of the container must not change decoded energies")
    // a corrupt payload carrying the RIFF/WAVE signature degrades to the
    // byte stub (same contract as decodePng) — never kills the task
    val corrupt = ("RIFF" + "    " + "WAVE" + "garbage header")
      .getBytes("US-ASCII")
    val stub = Multimodal.audioWindowsOf(Multimodal.Asset(4L, corrupt))
    assert(stub.nonEmpty && stub == Multimodal.audioWindowsOf(
      Multimodal.Asset(4L, corrupt)), "corrupt RIFF must fall back deterministically")
  }

  test("mm_filter flags replay the decode metadata exactly; the plan is shuffle-free") {
    val df = Multimodal.mmFilter(spark, sf)
    // the metadata gate is a pure map over the decode pass — any Exchange
    // here would shuffle the corpus for per-row arithmetic
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mm_filter must not shuffle:\n$plan")
    val meta = Multimodal.decode(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    val rows = df.collect()
    assert(rows.length == meta.size)
    rows.foreach { r =>
      val (nb, w, h) = meta(r.getLong(0))
      assert(r.getInt(1) == w && r.getInt(2) == h)
      val okSide = if (math.min(w, h) >= Multimodal.MinImgSide) 1 else 0
      val okAspect = if (w <= Multimodal.MaxAspect * h && h <= Multimodal.MaxAspect * w) 1 else 0
      val okBytes = if (nb >= Multimodal.MinAssetBytes) 1 else 0
      assert(r.getInt(3) == okSide && r.getInt(4) == okAspect && r.getInt(5) == okBytes &&
        r.getInt(6) == okSide * okAspect * okBytes, s"flag mismatch for doc ${r.getLong(0)}")
    }
    // the gate must be a real split on the shipped corpus, not a constant
    val kept = rows.count(_.getInt(6) == 1)
    assert(kept > 0 && kept < rows.length, s"degenerate gate: $kept/${rows.length}")
  }

  test("mm_phash_keep keeps the largest member of each perceptual cluster") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-phashkeep").toString
    val sp = spark
    import sp.implicits._
    val same = "the very same payload bytes travel three times " * 3
    // constant-byte payloads hash to phash 0 regardless of length (every
    // segment mean equals the total mean, strict > never fires), so docs
    // 7 and 8 pair at hamming 0 while DIFFERING in size — the keep rule's
    // discriminating case
    val docs = Seq(
      (1L, same), (2L, same), (3L, same),
      (7L, "a" * 50), (8L, "a" * 80),
      (9L, "abcdefghijklmnopqrstuvwxyz0123456789 once over"))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Multimodal.phashKeep(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out.values.map(_._2).sum == 6L, s"n_repr must conserve assets: $out")
    // equal-size identical triple: tie breaks to the smallest doc_id
    assert(out.get(1L).exists(_._2 == 3L), s"triple survivor must be doc 1: $out")
    // size-differing pair: the LARGER asset survives, not the smaller id
    assert(out.get(8L).exists(v => v._1 == 80 && v._2 == 2L),
      s"doc 8 (80 bytes) must beat doc 7 (50 bytes): $out")
    assert(out.contains(9L) && !out.contains(7L) && !out.contains(2L), s"$out")
  }

  test("mm_phash_dedup merges identical payloads and conserves the asset count") {
    // fixture corpus: three byte-identical assets (hamming 0 by
    // construction) + three structurally different ones
    val tmp = java.nio.file.Files.createTempDirectory("graft-phashdedup").toString
    val sp = spark
    import sp.implicits._
    val same = "the very same payload bytes travel three times " * 3
    val docs = Seq(
      (1L, same), (2L, same), (3L, same),
      (4L, "abcdefghijklmnopqrstuvwxyz0123456789 once over"),
      (5L, ("low " * 20) + ("HIGH! " * 20)),
      (6L, ("HIGH! " * 20) + ("low " * 20)))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Multimodal.phashDedup(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 6L, s"n_repr must conserve assets: $out")
    // the identical triple collapses to ONE cluster, canonical = min id
    assert(out.getOrElse(1L, 0L) >= 3L, s"identical payloads must merge under doc 1: $out")
    assert(!out.contains(2L) && !out.contains(3L),
      s"merged members must not survive as canonicals: $out")
  }

  test("mm_phash_incremental matches a brute-force hamming probe of batch vs corpus") {
    // fixture: two byte-identical corpus docs + one distinct; the batch
    // carries a copy of each cluster plus a novel asset
    val tmp = java.nio.file.Files.createTempDirectory("graft-phashinc").toString
    val sp = spark
    import sp.implicits._
    val a = "aaa bbb ccc shared payload body " * 4
    val b = "completely different corpus content over here " * 3
    val docs = Seq(
      (1L, a, "srcA"), (2L, a, "srcA"), (3L, b, "srcB"),
      (10L, a, "src0"), (11L, "zzz yyy xxx qqq novel drop", "src0"), (12L, b, "src0"))
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Multimodal.phashIncremental(spark, tmp).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
    // brute-force truth from the engine's own hashes (no bucket here nears
    // the salt cap, so the policy loses nothing and brute force is exact)
    val ph = Multimodal.phash(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val corpus = Seq(1L, 2L, 3L)
    val expect = Seq(10L, 11L, 12L).map { id =>
      val n = corpus.count(c =>
        java.lang.Long.bitCount(ph(id) ^ ph(c)) <= graft.operators.Dedup.MaxHamming)
      id -> ((n.toLong, if (n == 0) 1 else 0))
    }.toMap
    assert(out == expect, s"$out vs $expect")
    assert(out(10L)._1 == 2L && out(11L)._2 == 1 && out(12L)._1 == 1L,
      s"construction check (matches both copies / novel / one match): $out")
  }

  test("mm_text_align scores the exact cosine against the phash direction and keeps the top half") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-align").toString
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq(
      (0L, "the aligned document has its own embedding pointed at its hash"),
      (1L, "the anti document points exactly away from its perceptual hash"),
      (2L, "the orthogonal document splits its embedding half with half"),
      (3L, "the degenerate document carries an all zero embedding vector"))
    texts.map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // embeddings derived from each doc's OWN phash bits: +dir, -dir, a
    // half-flipped (orthogonal) dir, and the zero vector (the cos guard)
    val ph = Multimodal.phash(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    def dir(h: Long): Array[Float] =
      (0 until 64).map(j => if (((h >> j) & 1L) == 1L) 1.0f else -1.0f).toArray
    val embs = Seq(
      (0L, dir(ph(0L)), 0),
      (1L, dir(ph(1L)).map(-_), 0),
      (2L, dir(ph(2L)).zipWithIndex.map { case (v, i) => if (i < 32) v else -v }, 0),
      (3L, Array.fill(64)(0.0f), 0))
    embs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Multimodal.textAlign(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    assert(out(0L) == ((1.0, 1)), s"self-aligned embedding must score cos 1: $out")
    assert(out(1L) == ((-1.0, 0)), s"anti-aligned embedding must score cos -1 and drop: $out")
    assert(out(2L)._1 == 0.0 && out(3L)._1 == 0.0,
      s"orthogonal and zero embeddings score 0: $out")
    // calibrated top-half bar: ceil(4/2)=2 kept minimum, ties kept -> the
    // two zeros and the +1 survive, only the anti-aligned doc drops
    assert(out.values.count(_._2 == 1) == 3, s"ties at the bar are kept: $out")
  }
}
