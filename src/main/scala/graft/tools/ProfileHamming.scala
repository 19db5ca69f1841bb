package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the pigeonhole hamming engine: per consumer
  * (simhash / phash / audio fingerprint), the block-bucket census —
  * corpus size, the heaviest bucket per block and its corpus share —
  * plus candidate volume before/after the degenerate-block mask. */
object ProfileHamming {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.local(16)
    s.sparkContext.setLogLevel("ERROR")
    val M = graft.operators.Multimodal
    val D = graft.operators.Dedup

    def probe(label: String, hashed: org.apache.spark.sql.DataFrame): Unit = {
      val blocked = D.hammingBlocked(hashed).localCheckpoint()
      val n = blocked.filter(col("band") === 0).count()
      val top = blocked.groupBy(col("band"), col("h"))
        .agg(count(lit(1)).as("bn"))
        .groupBy(col("band")).agg(max(col("bn")).as("top"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val shares = (0 to 2).map(b =>
        f"b$b=${top.getOrElse(b, 0L)}(${100.0 * top.getOrElse(b, 0L) / n}%.1f%%)")
      println(s"[ham] $label n=$n ${shares.mkString(" ")}")
    }

    probe("simhash", D.simhash(s, sf)
      .select(col("doc_id"), col("simhash").as("h")))
    probe("phash", M.phash(s, sf).select(col("doc_id"), col("phash").as("h")))
    probe("audio", M.audioFingerprint(s, sf)
      .select(col("doc_id"), col("afp").as("h")))

    // masked vs unmasked: verified pair sets and candidate volumes
    def pairsOf(hashed: org.apache.spark.sql.DataFrame, mask: Boolean) =
      D.hammingCandidates(hashed, maskDegenerate = mask)
        .select(col("doc_a"), col("doc_b"),
          expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
        .filter(col("hamming") <= D.MaxHamming)
    for ((label, hashed) <- Seq(
        "simhash" -> D.simhash(s, sf).select(col("doc_id"), col("simhash").as("h")),
        "phash" -> M.phash(s, sf).select(col("doc_id"), col("phash").as("h")),
        "audio" -> M.audioFingerprint(s, sf).select(col("doc_id"), col("afp").as("h")))) {
      val h = hashed.localCheckpoint()
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val t0 = System.nanoTime
      val masked = key(pairsOf(h, mask = true))
      val tm = (System.nanoTime - t0) / 1e9
      val t1 = System.nanoTime
      val unmasked = key(pairsOf(h, mask = false))
      val tu = (System.nanoTime - t1) / 1e9
      val cm = D.hammingCandidates(h, maskDegenerate = true).count()
      val cu = D.hammingCandidates(h, maskDegenerate = false).count()
      println(f"[ham] $label verified masked=${masked.size} unmasked=${unmasked.size} " +
        f"identical=${masked == unmasked} cand masked=$cm unmasked=$cu " +
        f"sec masked=$tm%.2f unmasked=$tu%.2f")
      // brute-force ground truth (quadratic — profiler only, small corpora)
      if (h.count() <= 20000) {
        val a = h.select(col("doc_id").as("doc_a"), col("h").as("ha"))
        val b = h.select(col("doc_id").as("doc_b"), col("h").as("hb"))
        val truth = a.join(b, col("doc_a") < col("doc_b"))
          .filter(expr("bit_count(ha ^ hb)") <= D.MaxHamming).count()
        println(s"[ham] $label truth=$truth recall masked=${masked.size}/$truth unmasked=${unmasked.size}/$truth")
      }
    }
    s.stop()
  }
}
