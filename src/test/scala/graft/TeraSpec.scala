package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Tera
import graft.sources.Tables

class TeraSpec extends SparkSpec {

  test("teragen records have the canonical 10-byte key / 90-byte value shape") {
    val bad = Tera.teragen(spark, sf)
      .filter(length(col("key")) =!= 20 || length(col("value")) =!= 90)
      .count()
    assert(bad == 0, "every record must be 20 hex chars of key + 90 chars of value")
    assert(Tera.teragen(spark, sf).count() == Tera.TeraN)
  }

  test("terasort is globally sorted and plans a range partitioning (TotalOrderPartitioner analog)") {
    val sorted = Tera.terasort(spark, sf)
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected a range-partitioned sort:\n$plan")
    val keys = sorted.select("key").collect().map(_.getString(0))
    assert(keys.sameElements(keys.sorted), "terasort output not globally ordered")
  }

  test("terachecksum is partitioning-independent (order-independent fold)") {
    val direct = Tera.terachecksum(spark, sf).collect().head
    val reparted = Tera.teragen(spark, sf).repartition(7)
      .select(conv(substring(md5(concat(col("key"), col("value")).cast("binary")), 1, 10), 16, 10)
        .cast("long").as("cksum"))
      .agg(count(lit(1)).as("n_records"), sum(col("cksum")).as("checksum"))
      .collect().head
    assert(direct.getLong(0) == reparted.getLong(0))
    assert(direct.getLong(1) == reparted.getLong(1))
  }

  test("gensort LCG skip-ahead matches the closed form and step-by-step iteration") {
    import graft.functions.GensortLcg
    val mod = BigInt(1) << 128
    // Independent route: X_n = C * (A^n - 1) / (A - 1) mod 2^128, the
    // geometric-series closed form computed with EXACT integer arithmetic
    // ((A^n - 1) is divisible by (A - 1) over the integers, so no modular
    // inverse is needed) — a completely different derivation than the
    // squaring-based skip table.
    def closedForm(n: Int): BigInt =
      (GensortLcg.C * ((GensortLcg.A.pow(n) - 1) / (GensortLcg.A - 1))) % mod
    Seq(1, 2, 3, 10, 57, 123).foreach { n =>
      assert(GensortLcg.skipAhead(n) == closedForm(n), s"skipAhead($n) != closed form")
    }
    var x = BigInt(0)
    (1 to 7).foreach { n =>
      x = GensortLcg.nextRand(x)
      assert(GensortLcg.skipAhead(n) == x, s"skipAhead($n) != $n iterated steps")
    }
  }

  test("gensort records carry the exact GenSort layout for the first 10 record numbers") {
    import graft.functions.GensortLcg
    (0L until 10L).foreach { rec =>
      val r = GensortLcg.record(rec)
      assert(r.length == 100)
      val rand = GensortLcg.nextRand(GensortLcg.skipAhead(rec))
      (0 until 10).foreach(i => assert(r(i) == GensortLcg.byteAt(rand, i), s"key byte $i of rec $rec"))
      assert(r(10) == 0x00 && r(11) == 0x11)
      val recHex = new String(r.slice(12, 44), "US-ASCII")
      assert(recHex == GensortLcg.hex32(BigInt(rec)), s"record-number hex of rec $rec")
      assert(r(44) == 0x88.toByte && r(45) == 0x99.toByte &&
        r(46) == 0xAA.toByte && r(47) == 0xBB.toByte)
      val randHex = GensortLcg.hex32(rand)
      (0 until 12).foreach { i =>
        val ch = randHex.charAt(20 + i).toByte
        (0 until 4).foreach(j => assert(r(48 + i * 4 + j) == ch, s"filler $i/$j of rec $rec"))
      }
      assert(r(96) == 0xCC.toByte && r(97) == 0xDD.toByte &&
        r(98) == 0xEE.toByte && r(99) == 0xFF.toByte)
    }
  }

  test("distributed gensort records equal the local generator byte for byte") {
    import graft.functions.GensortLcg
    val rows = Tera.teragenGensort(spark, 64).repartition(8)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
    assert(rows.size == 64)
    rows.foreach { case (rec, bytes) =>
      assert(bytes.sameElements(GensortLcg.record(rec)),
        s"record $rec differs between partition-parallel and local generation")
    }
  }

  test("random binary KV round-trips through a BytesWritable SequenceFile") {
    val dir = Files.createTempDirectory("graft_seqbin").toString + "/rb"
    // Materialize the mr_random_binary derivation as actual bytes: key is the
    // raw 16-byte md5 digest, value is value_len deterministic filler bytes.
    val recs = Tera.randomBinary(spark, sf)
      .selectExpr(
        "unhex(key_md5) AS key",
        "cast(substring(repeat(md5(concat('b', cast(id AS string))), 32), 1, value_len) AS binary) AS value")
    Tables.writeSequenceFileBinary(recs, "key", "value", dir)
    val back = Tables.readSequenceFileBinary(spark, dir)
    assert(back.count() == Tera.RandBinN)
    def sig(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.selectExpr("md5(concat(key, value)) AS s").collect().map(_.getString(0)).toSet
    assert(sig(back) == sig(recs), "binary KV content changed through the SequenceFile")
    assert(back.filter(expr("length(key) <> 16")).count() == 0,
      "keys must be raw 16-byte digests")
  }
}
