package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension demo: per-key top-k as a first-class physical
  * operator (logical node → strategy → SparkPlan).
  *
  * The stock formulation (`row_number() OVER (PARTITION BY k ORDER BY o)`
  * + filter) must fully sort every key group; this operator keeps a
  * bounded heap per key — O(n log k) per partition, memory bounded by
  * (#keys-in-partition × k rows), no sort, no spill pressure. The required
  * child distribution is ClusteredDistribution(keys), so Spark plans
  * exactly one hash exchange — the same shuffle the window needs, minus
  * the sort.
  *
  * The strategy plans it as PARTIAL → exchange → FINAL, exactly like a
  * hash aggregate: the partial pass runs the same bounded-heap scan on
  * each map-side partition with no distribution requirement, so at most
  * (#keys-in-partition × k) rows ever reach the exchange. A candidate-
  * scored input (e.g. the kNN-graph's n×n cosine stream) shuffles k rows
  * per key per partition instead of the whole score stream — the combine
  * step a window formulation cannot have. Requires the ordering to be a
  * TOTAL order per key (tie rows retained by a partial pass are
  * arrival-order-dependent otherwise) — every graft call site orders by
  * a unique trailing key column.
  */
case class TopKPerKeyNode(
    groupingKeys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output

  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, child) =>
      TopKPerKeyExec(keys, ordering, k,
        TopKPerKeyExec(keys, ordering, k, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    groupingKeys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  // Partial = map-side combine: no distribution requirement, keeps the
  // child's partitioning, emits at most k rows per key per partition.
  // Final: empty keys = GLOBAL top-k — every row must reach one task or
  // each partition would emit its own k rows (matching WindowExec's
  // contract); the per-key path only needs co-location of equal keys.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else if (groupingKeys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupingKeys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    require(k > 0, s"TopKPerKeyExec requires k > 0, got $k")
    val kLocal = k
    val keyExprs = groupingKeys
    val ordSeq = ordering
    val childOutput = child.output
    child.execute().mapPartitionsInternal { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // `ord.compare(a, b) < 0` ⇔ a sorts before b per `ordering`
      val ord = new LazilyGeneratedOrdering(ordSeq, childOutput)
      // heap head = the worst retained row (reverse order), so a better
      // incoming row evicts it in O(log k)
      val heaps = mutable.HashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.valuesIterator.flatMap { h =>
        import scala.jdk.CollectionConverters._
        h.iterator().asScala
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
