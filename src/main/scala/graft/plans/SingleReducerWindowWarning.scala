package graft.plans

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => WindowPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer lint rule (injected via [[graft.GraftExtensions]]): a
  * window with an empty PARTITION BY sorts EVERY row through one task —
  * correct on test data, a stall at 100 TB (the exact plan shape the
  * vocabulary top-k once had before moving to the bounded heap
  * aggregator). The rule never mutates the plan; it logs the offending
  * window expressions and bumps a counter the plan-hygiene spec reads.
  * Detection at optimization time means the warning fires for ANY query
  * built in the session, not just the ones a reviewer eyeballs.
  */
class SingleReducerWindowWarning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case w: WindowPlan if w.partitionSpec.isEmpty =>
        SingleReducerWindowWarning.hits.incrementAndGet()
        logWarning("window with empty PARTITION BY funnels all rows " +
          s"through ONE task: ${w.windowExpressions.map(_.sql).mkString(", ")}")
      case _ => ()
    }
    plan
  }
}

object SingleReducerWindowWarning {
  /** Total global-window sightings in this JVM (a rule may run more than
    * once per query — compare before/after deltas, not absolute counts). */
  val hits = new AtomicLong(0L)
}
