package graft.plans

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Analysis-only lint for the unpartitioned-window anti-pattern: a
  * `Window` with an empty PARTITION BY collapses its entire input onto one
  * task (Spark itself warns `WindowExec: No Partition Defined` at run
  * time), which at 100 TB is a single-executor sort of the corpus — an
  * incident, not a slowdown. The library's discipline is that every
  * global window must sit above a provably row-bounded input (a LIMIT /
  * TakeOrdered cut, an aggregate-to-constant, or literal local data);
  * this rule turns that convention into a plan-time check, the same
  * shape as [[FanoutLint]].
  *
  * The rule NEVER rewrites. It is registered via [[GraftExtensions]]
  * (preCBO, settled-plan semantics) and logs each finding once;
  * [[WindowLint.unboundedGlobalWindows]] is the pure checker PlanSpec
  * sweeps over every `SparkEntry.queries` demo so a new demo with an
  * unbounded global window fails `sbt test` rather than burning a
  * cluster.
  */
object WindowLint extends Rule[LogicalPlan] {

  /** Recent findings (bounded), for tests and operator tooling. */
  private val findings = new ConcurrentLinkedQueue[String]()

  def recentFindings: Seq[String] = findings.asScala.toSeq

  def clear(): Unit = findings.clear()

  private def record(msg: String): Unit = {
    if (!findings.contains(msg)) {
      findings.add(msg)
      while (findings.size > 100) findings.poll()
      logWarning(s"[window-lint] $msg")
    }
  }

  /** Is this subtree provably bounded to a small row count by plan
    * structure alone? Conservative: LIMIT (any literal), global
    * aggregate (one row), literal local data / single row, and anything
    * reached from those through grain-preserving operators. A join of
    * two bounded sides is bounded by their product (both sides small by
    * the same proof). Grouped aggregates and scans are NOT bounded —
    * "the key domain is small" is a domain claim, not a plan property.
    */
  private def bounded(plan: LogicalPlan): Boolean = plan match {
    case _: GlobalLimit | _: LocalLimit => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case _: OneRowRelation => true
    case _: LocalRelation => true
    case p: Project => bounded(p.child)
    case f: Filter => bounded(f.child)
    case s: Sort => bounded(s.child)
    case s: SubqueryAlias => bounded(s.child)
    case w: Window => bounded(w.child)
    case d: Distinct => bounded(d.child)
    case r: RepartitionOperation => bounded(r.child)
    case j: Join => bounded(j.left) && bounded(j.right)
    case _ => false
  }

  /** All unpartitioned windows over unbounded input in `plan`, as
    * human-readable descriptions; empty means the plan honors the
    * bounded-global-window discipline.
    */
  def unboundedGlobalWindows(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
        s"unpartitioned window [${w.windowExpressions.map(_.sql).mkString(", ")}] " +
          "over input not provably bounded (no LIMIT/global-aggregate cut below it) — " +
          "this sorts the full input on ONE task at scale"
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    unboundedGlobalWindows(plan).foreach(record)
    plan
  }
}
