package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window => WindowPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator replacement for the `row_number() OVER (PARTITION BY g
  * ORDER BY s) <= k` idiom — the one plan shape Spark executes with a
  * buffering WindowExec even though only the first k rows of each group
  * can survive the filter above it.
  *
  * Three pieces, all registered through [[graft.GraftExtensions]] (the
  * standard `SparkSessionExtensions` deployment, nothing private):
  *
  *  - [[TopKPerGroup]]: the custom logical node the rewrite introduces.
  *  - [[TopKPerGroupRewrite]]: an injected optimizer rule that matches
  *    `Filter(rn <= k, Window(row_number))` (including a `CAST(rn)` and
  *    extra conjuncts) and swaps the subtree for the logical node. Rank
  *    RANGES (`rn >= 2`) and multi-function windows are left alone.
  *  - [[TopKPerGroupExec]]: the physical operator. It declares the same
  *    requirements a window would (cluster by group, sort by group +
  *    order), so EnsureRequirements plans the identical exchange/sort —
  *    but execution is one streaming pass that emits the first k rows
  *    per group and DROPS the rest: no window partition buffer, no rank
  *    computed for rows the filter would discard. At 100 TB the win is
  *    memory-shaped: per-task state is one group key + a counter,
  *    regardless of how hot a group is.
  *
  * Queries need no change to benefit — every `row_number`-then-filter in
  * this library plans through it when the extension is installed, and
  * the results are bit-identical (the differential oracle gate runs all
  * of them through this path).
  */
case class TopKPerGroup(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  // rn is produced HERE, not read from below — without this the node
  // reports a non-empty missingInput and plan-validation modes
  // (spark.sql.planChangeValidation) reject the rewritten plan.
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

class TopKPerGroupRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** The attribute a rank predicate tests, looking through a CAST. */
  private def rankedAttr(e: Expression): Option[Attribute] = e match {
    case a: Attribute => Some(a)
    case c: Cast => c.child match {
      case a: Attribute => Some(a)
      case _ => None
    }
    case _ => None
  }

  private def intOf(l: Literal): Option[Long] = l.value match {
    case i: Int => Some(i.toLong)
    case i: Long => Some(i)
    case _ => None
  }

  /** `Some(k)` iff `cond` keeps exactly the ranks 1..k of `rn`. */
  private def rankLimit(cond: Expression, rn: Attribute): Option[Long] = {
    def is(e: Expression) = rankedAttr(e).exists(_.exprId == rn.exprId)
    cond match {
      case LessThanOrEqual(e, l: Literal) if is(e) => intOf(l)
      case LessThan(e, l: Literal) if is(e) => intOf(l).map(_ - 1)
      case GreaterThanOrEqual(l: Literal, e) if is(e) => intOf(l)
      case GreaterThan(l: Literal, e) if is(e) => intOf(l).map(_ - 1)
      case EqualTo(e, l: Literal) if is(e) => intOf(l).filter(_ == 1L)
      case EqualTo(l: Literal, e) if is(e) => intOf(l).filter(_ == 1L)
      case _ => None
    }
  }

  /** Float/double group keys need NormalizeFloatingNumbers (0.0 vs -0.0,
    * NaN bit patterns) before byte-wise grouping, and that rule runs
    * AFTER this batch and doesn't know our node — so leave such windows
    * on the WindowExec path. */
  private def containsFloat(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case FloatType | DoubleType => true
      case s: StructType => s.fields.exists(f => containsFloat(f.dataType))
      case a: ArrayType => containsFloat(a.elementType)
      case m: MapType => containsFloat(m.keyType) || containsFloat(m.valueType)
      case _ => false
    }
  }

  private def hasFloatKey(partitionSpec: Seq[Expression]): Boolean =
    partitionSpec.exists(e => containsFloat(e.dataType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case f @ Filter(cond, w: WindowPlan)
        if w.windowExpressions.size == 1 && w.orderSpec.nonEmpty &&
          !hasFloatKey(w.partitionSpec) =>
      val rnOpt = w.windowExpressions.head match {
        case a @ Alias(WindowExpression(RowNumber(), _), _) => Some(a.toAttribute)
        case _ => None
      }
      rnOpt.map { rn =>
        val conjuncts = splitConjunctivePredicates(cond)
        val (ranks, rest) = conjuncts.partition(c => rankLimit(c, rn).isDefined)
        val ks = ranks.flatMap(rankLimit(_, rn))
        // exactly one rank bound, k sane, and no OTHER predicate reads
        // the rank column (rn >= 2 pagination must keep the window)
        if (ks.size == 1 && ks.head >= 1 && ks.head <= Int.MaxValue &&
            rest.forall(r => !r.references.contains(rn))) {
          val topk = TopKPerGroup(w.partitionSpec, w.orderSpec,
            ks.head.toInt, rn, w.child)
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
        } else f
      }.getOrElse(f)
  }
}

class TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(p, o, k, rn, child) =>
      TopKPerGroupExec(p, o, k, rn, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr :: Nil)

  // The same requirements WindowExec would declare — EnsureRequirements
  // inserts the identical hash exchange + sort, so the plan differs only
  // in the operator that consumes them.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionSpec.map(SortOrder(_, Ascending)) ++ orderSpec)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val groupExprs = partitionSpec
    val rn = rnAttr
    child.execute().mapPartitions({ iter =>
      val grouping = UnsafeProjection.create(groupExprs, childOutput)
      val result = UnsafeProjection.create(childOutput :+ rn, childOutput :+ rn)
      val joined = new JoinedRow
      val rnRow = new SpecificInternalRow(Seq(rn.dataType))
      var current: UnsafeRow = null
      // Long, and only advanced while ≤ k: an Int counter free-running
      // over a >2^31-row group would wrap negative and re-emit.
      var rank = 0L
      iter.flatMap { row =>
        val g = grouping(row)
        if (current == null || g != current) {
          current = g.copy()
          rank = 0L
        }
        if (rank < kLocal) {
          rank += 1
          rnRow.setInt(0, rank.toInt)
          Some(result(joined(row, rnRow)): InternalRow)
        } else None
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
