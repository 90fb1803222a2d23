package org.apache.spark.sql.graft

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
    // Partial-pass live-row budget (round 12). The partial pass has no
    // distribution requirement, so a map-side partition can see EVERY key:
    // the IVF kNN graph's candidate stream is partitioned by (cell, salt)
    // and each of the 32 partitions touches ~all 2M query keys — an
    // unbounded per-key heap map held 32 partitions × 2M keys × ~500 B
    // ≈ 32 GB live and the 2M-vector IvfScale run died in a full-GC
    // spiral (old gen pinned at 99.95% across 3 000+ full GCs). The map
    // is now LRU-capped by LIVE ROWS: when the budget trips, the
    // least-recently-touched heap is emitted early and dropped. Early
    // emission is a correct combine — each heap instance emits its own
    // top-k of the rows it saw, and any row it dropped is dominated by k
    // emitted rows of the same instance, so the final pass's merged
    // top-k is unchanged (call sites guarantee a total order per key, so
    // results are deterministic regardless of where evictions land).
    // Sort-merge-joined inputs stream each probe row's matches
    // consecutively, so LRU eviction preserves full combining there; a
    // randomly-ordered input degrades toward pass-through emission,
    // never toward wrong answers or unbounded memory.
    val maxLiveRows =
      if (partial)
        session.conf.get("spark.graft.topk.partialMaxRows", (1 << 18).toString).toInt
      else Int.MaxValue
    child.execute().mapPartitionsInternal { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // `ord.compare(a, b) < 0` ⇔ a sorts before b per `ordering`
      val ord = new LazilyGeneratedOrdering(ordSeq, childOutput)
      // heap head = the worst retained row (reverse order), so a better
      // incoming row evicts it in O(log k); access-ordered map so the
      // partial pass can evict-emit the least-recently-touched key
      val heaps = new java.util.LinkedHashMap[
        UnsafeRow, java.util.PriorityQueue[InternalRow]](1024, 0.75f, true)
      new Iterator[InternalRow] {
        private val pending = new java.util.ArrayDeque[InternalRow]()
        private var liveRows = 0
        private var inputDone = false

        private def emitHeap(h: java.util.PriorityQueue[InternalRow]): Unit = {
          liveRows -= h.size
          val hi = h.iterator()
          while (hi.hasNext) pending.add(hi.next())
        }

        private def refill(): Unit = {
          while (pending.isEmpty && !inputDone) {
            if (it.hasNext) {
              val row = it.next()
              val key = keyProj(row)
              var heap = heaps.get(key)
              if (heap == null) {
                heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
                heaps.put(key.copy(), heap)
              }
              if (heap.size < kLocal) {
                heap.add(row.copy())
                liveRows += 1
              } else if (ord.compare(row, heap.peek()) < 0) {
                heap.poll()
                heap.add(row.copy())
              }
              while (liveRows > maxLiveRows && heaps.size() > 1) {
                val ei = heaps.entrySet().iterator()
                val eldest = ei.next()
                ei.remove()
                emitHeap(eldest.getValue)
              }
            } else {
              inputDone = true
              val vi = heaps.values().iterator()
              while (vi.hasNext) emitHeap(vi.next())
              heaps.clear()
            }
          }
        }

        override def hasNext: Boolean = { refill(); !pending.isEmpty }
        override def next(): InternalRow = {
          refill()
          if (pending.isEmpty) throw new NoSuchElementException("empty top-k partition")
          pending.poll()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
