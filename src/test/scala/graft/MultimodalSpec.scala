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

  test("mm_frame_sample emits at most 4 frames per asset with 32-hex fingerprints") {
    val df = Multimodal.frameSample(spark, sf)
    import org.apache.spark.sql.functions._
    val maxFrames = df.groupBy("doc_id").count().agg(max("count")).collect().head.getLong(0)
    assert(maxFrames <= 4)
    assert(df.filter(not(col("frame_md5").rlike("^[0-9a-f]{32}$"))).count() == 0)
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
}
