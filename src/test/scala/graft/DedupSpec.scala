package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("capped LSH with a generous cap equals the exact candidate set") {
    assert(pairs(Dedup.minhashLshCapped(spark, sf, 100000)) ==
      pairs(Dedup.minhashLsh(spark, sf)))
  }

  test("capped LSH is a subset of the exact candidate set and drops big buckets") {
    val capped = pairs(Dedup.minhashLshCapped(spark, sf, 2))
    val full = pairs(Dedup.minhashLsh(spark, sf))
    assert(capped.subsetOf(full))
  }

  test("cluster ids are canonical: every cluster_id is the min doc_id of its cluster") {
    val rows = Dedup.clusterAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid min is not the label")
    }
  }
}
