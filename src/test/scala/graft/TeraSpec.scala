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
