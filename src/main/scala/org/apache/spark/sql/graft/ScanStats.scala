package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics => V2Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}

/** `V2ScanRelationPushDown` wraps every V1-bridged scan in a
  * [[V1ScanWrapper]] that does NOT forward [[SupportsReportStatistics]],
  * so a stats-reporting `V1Scan` (the graft catalog scan's post-pruning
  * byte estimate) never reaches `DataSourceV2ScanRelation.computeStats` —
  * join planning falls back to `defaultSizeInBytes` (Long.Max) and a
  * point-pruned slice of a huge table can never auto-broadcast. This
  * subclass carries the forwarding; case-class pattern matches on
  * `V1ScanWrapper` (the DSv2 strategy's extractor) keep working on it.
  * Lives in the shim package: `V1ScanWrapper` is `private[sql]` in source.
  */
final class StatsV1ScanWrapper(v1: V1Scan,
                               handled: Seq[org.apache.spark.sql.sources.Filter],
                               ops: PushedDownOperators)
    extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): V2Statistics =
    v1.asInstanceOf[SupportsReportStatistics].estimateStatistics()

  // the case-class equality inherited from V1ScanWrapper would make the
  // rewrapped node EQUAL its original, so TreeNode.transform keeps the old
  // node and the rewrap silently never lands (probed r18) — a stats
  // wrapper only equals another stats wrapper
  override def canEqual(that: Any): Boolean = that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(other: Any): Boolean = other match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
  override def hashCode(): Int = super.hashCode() * 31 + 1
}

/** Optimizer rule (installed via [[GraftFunctions.installOptimizations]],
  * which puts it in the LAST batch — after pushdown has produced the
  * wrappers): rewrap stats-capable V1 scans so their estimate reaches the
  * logical plan's statistics. Idempotent under the fixed-point batch: the
  * class guard skips already-rewrapped nodes.
  */
object ForwardV1ScanStats extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case rel: DataSourceV2ScanRelation
        if rel.scan.getClass == classOf[V1ScanWrapper] &&
          rel.scan.asInstanceOf[V1ScanWrapper].v1Scan
            .isInstanceOf[SupportsReportStatistics] =>
      val w = rel.scan.asInstanceOf[V1ScanWrapper]
      rel.copy(scan =
        new StatsV1ScanWrapper(w.v1Scan, w.handledFilters, w.pushedDownOperators))
  }
}
