package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{GunzipIfGzip, GzipCompress}

/** Optimizer rules for the engine's custom expressions.
  *
  * The parity pipeline needs no custom rules (SURVEY.md §4.1 — Catalyst's
  * pushdown/pruning cover it); this one exists because replay/fixture
  * plans legitimately compose `gunzip_if_gzip(gzip_compress(x))` — an
  * identity for every binary input (compress then magic-sniffed inflate) —
  * and eliminating it drops two full payload passes per row.
  */
object GzipRoundtripElimination extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GunzipIfGzip(GzipCompress(child)) => child
    }
}
