package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.graft.CatalystBridge

/** Custom whole-operator: top-k rows per key, as a two-phase physical
  * operator (SURVEY §2E / §5).
  *
  * The declarative alternative — window row_number + filter — sorts every
  * partition fully and shuffles EVERY row to its key's reducer. At 100 TB
  * that shuffle is the job. This operator:
  *   1. partial phase (map side): one bounded heap per key per partition —
  *      at most k rows per (key, partition) survive;
  *   2. exchange: Spark inserts a hash-partition shuffle on the keys
  *      (requiredChildDistribution), moving only the survivors;
  *   3. final phase: merge heaps, emit each key's top-k in order.
  * It is the MapReduce combiner pattern (reference: WordCount.java:78
  * setCombinerClass) generalized to an order-statistic — the map-side
  * combine Catalyst plans for sums, hand-built for top-k, packaged as a
  * LogicalPlan + Strategy + two UnaryExecNodes.
  */
case class TopKPerKeyNode(child: LogicalPlan, keys: Seq[Expression],
    order: Seq[SortOrder], k: Int) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(child, keys, order, k) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val isPartial = partial
    child.execute().mapPartitions { iter =>
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // ord orders "better first"; the PriorityQueue dequeues its max —
      // i.e. the current worst survivor — which is what eviction needs.
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(sortOrder, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { r =>
        val row = toUnsafe(r)
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[UnsafeRow](ord.asInstanceOf[Ordering[UnsafeRow]]))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      if (isPartial) heaps.valuesIterator.flatMap(_.iterator)
      else heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKey {

  /** Idempotent strategy registration on any session. */
  def register(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = strategies :+ TopKStrategy
  }

  /** Top `k` rows per distinct value of `keyCols`, ranked by `orderCols`
    * (use Column.desc/asc). Emitted in rank order within each key. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    // Let the analyzer resolve the sort expressions: plan a throwaway
    // sortWithinPartitions and harvest its resolved SortOrder + child.
    val (sortOrder, analyzed) =
      df.sortWithinPartitions(orderCols: _*).queryExecution.analyzed match {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
        case other => throw new IllegalStateException(s"expected Sort plan, got $other")
      }
    val keyExprs: Seq[Expression] = keyCols.map { n =>
      analyzed.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"no column $n in ${analyzed.output.map(_.name)}"))
    }
    CatalystBridge.ofRows(spark, TopKPerKeyNode(analyzed, keyExprs, sortOrder, k))
  }
}
