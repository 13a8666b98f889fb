package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY.md §2-J tier (c)): per-group top-k
  * as a first-class plan node — custom `LogicalPlan` + `SparkStrategy`
  * + `SparkPlan`, registered through `SparkSessionExtensions`
  * (GraftExtensions) or per-session via `experimental.extraStrategies`.
  *
  * Why built-ins aren't enough: the declarative formulation
  * (`row_number().over(partitionBy(keys).orderBy(...)) <= k`, the
  * `win_topk_per_group` key) must FULLY SORT every shuffle partition
  * before it can rank — O(n log n) per partition, all n rows shuffled.
  * This operator runs in two phases like an aggregate: a map-side
  * partial pass keeps a bounded k-heap per group (O(n log k), no sort),
  * so at most k rows per (group × input partition) reach the exchange;
  * the final pass re-merges heaps after a hash shuffle on the group
  * keys. At 100 TB with k ≪ rows/group the shuffle shrinks by orders
  * of magnitude and the full sort disappears.
  *
  * Determinism: callers must pass a TOTAL sort order (include a
  * tie-breaking unique column) — same contract as any oracle-checked
  * ordering in this engine.
  */
case class TopKPerGroup(
    groupKeys: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    maxPartialGroups: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topKPerGroup: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange via
  * EnsureRequirements) → final, mirroring hash aggregation's shape. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(keys, order, k, maxGroups, child) =>
      val partial = TopKPerGroupExec(keys, order, k, maxGroups,
        partial = true, planLater(child))
      TopKPerGroupExec(keys, order, k, maxGroups,
        partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded per-group heap pass. `partial = true` runs on whatever
  * distribution the child has (map-side); the final instance declares
  * `ClusteredDistribution(groupKeys)` so EnsureRequirements inserts
  * exactly one hash exchange between the two — over at most
  * k × groups × input-partitions rows, not the full input. */
case class TopKPerGroupExec(
    groupKeys: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    maxPartialGroups: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupKeys))

  override protected def doExecute(): RDD[InternalRow] = {
    val keys = groupKeys
    val order = sortOrder
    val schema = child.output
    val limit = k
    val isPartial = partial
    val maxGroups = maxPartialGroups
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keys, schema)
      // BaseOrdering <: Ordering[InternalRow]; PriorityQueue's head is
      // the MAXIMUM under it = the worst-ranked retained row.
      val ord = RowOrdering.create(order, schema)
      val heaps =
        new java.util.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      val absorbed = it.flatMap { row =>
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null && (!isPartial || heaps.size() < maxGroups)) {
          q = mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), q)
        }
        if (q == null) {
          // partial-phase overflow: emit unreduced (never stored)
          Iterator.single(row)
        } else {
          if (q.size < limit) q.enqueue(row.copy())
          else if (ord.compare(row, q.head) < 0) {
            q.dequeue()
            q.enqueue(row.copy())
          }
          Iterator.empty
        }
      }
      // ++ is lazy in its right operand: heaps drain only after the
      // input is exhausted
      absorbed ++ heaps.values().iterator().asScala.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Column-name-level API over the plan node. */
object GraftOps {
  /** Top `k` rows per `keyCols` group under `order` — a list of
    * (column, ascending) pairs that must form a total order. Output
    * row order is unspecified (sort afterward if needed).
    *
    * `maxPartialGroups` bounds map-side memory: at most this many
    * groups are tracked per input partition (≈ maxPartialGroups × k
    * retained rows); overflow rows PASS THROUGH unreduced — still
    * correct, the final phase computes the exact top-k, so degrading
    * the partial reduction under ultra-high group cardinality is the
    * hash-aggregate-style fallback, not an error. The final phase
    * holds k rows per group on its reducer (k ≪ group size), the
    * inherent memory floor of hash-based top-k. */
  def topKPerGroup(df: DataFrame, keyCols: Seq[String],
                   order: Seq[(String, Boolean)], k: Int,
                   maxPartialGroups: Int = 100000): DataFrame = {
    GraftSqlBridge.addStrategy(df.sparkSession, TopKStrategy)
    val child = GraftSqlBridge.analyzedPlan(df)
    // Resolve with the session's resolver (case-insensitive by default,
    // like every built-in operator) and refuse ambiguity instead of
    // silently picking the first duplicate-named attribute.
    val resolver = df.sparkSession.sessionState.conf.resolver
    def attr(n: String): Attribute =
      child.output.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"topKPerGroup: no column '$n' in ${child.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"topKPerGroup: column '$n' is ambiguous — matches ${many.map(_.name).mkString(", ")}")
      }
    val sortOrder = order.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending) }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerGroup(keyCols.map(attr), sortOrder, k, maxPartialGroups, child))
  }
}
