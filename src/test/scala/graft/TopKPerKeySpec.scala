package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopKPerKey
import graft.sources.Tables

class TopKPerKeySpec extends SparkSpec {

  test("matches the window row_number formulation exactly") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("event_id"), col("value"))
    val custom = TopKPerKey.topKPerKey(ev, Seq("event_type"),
        Seq(col("value").desc, col("event_id").asc), 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id").asc)
    val reference = ev.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .drop("rn").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(custom == reference)
  }

  test("plans as two-phase exec with a shuffle between (partial heaps before exchange)") {
    val ev = Tables.load(spark, sf, "events").select(col("event_type"), col("event_id"), col("value"))
    val p = TopKPerKey.topKPerKey(ev, Seq("event_type"), Seq(col("value").desc), 3)
      .queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(p).size == 2, p)
    assert(p.contains("Exchange"), s"missing shuffle between phases:\n$p")
  }

  test("each key yields at most k rows, in rank order") {
    val ev = Tables.load(spark, sf, "events").select(col("event_type"), col("event_id"), col("value"))
    val out = TopKPerKey.topKPerKey(ev, Seq("event_type"), Seq(col("value").desc, col("event_id").asc), 3)
    val byKey = out.collect().groupBy(_.getString(0))
    assert(byKey.values.forall(_.length <= 3))
    byKey.values.foreach { rows =>
      val vals = rows.map(r => (-r.getDouble(2), r.getLong(1))).toSeq
      assert(vals == vals.sorted, "rows not emitted in rank order within key")
    }
  }
}
