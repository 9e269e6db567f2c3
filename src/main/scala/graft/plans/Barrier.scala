package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge

/** Pushdown fence for expensive derived-column projections.
  *
  * Problem (observed in the route plans): `Router.route` defines
  * `route`/`event_ts` as aliases over a single `from_json` parse. Any
  * downstream filter on those columns is pushed below the defining
  * projection by `PushDownPredicates`, substituting the full defining
  * expression into the Filter — ~20 inlined `from_json` copies plus two
  * timestamp ladders per row, and the surviving rows then parse again in
  * the projection above (measured 3.6× on `pipe_deadletter_layout`).
  * `KnownNotNull` blocks constraint *inference* but not alias substitution.
  *
  * Fix: a logical node no optimizer rule knows, so no filter is pushed
  * through it — the parse below evaluates exactly once per row.
  * `ColumnPruning`'s generic case still prunes through it (it inserts
  * pruning projections under any node's children), so scans stay narrow.
  * At physical planning [[OptimizationBarrier.Strategy]] erases the node —
  * zero runtime cost, no codegen break, identical plan minus the
  * duplicated filters.
  *
  * Trade-off (documented contract): filters written *after* the fence do
  * not reach the scan. Callers should filter source columns *before*
  * `Router.route` — after it, the only useful predicates are on derived
  * columns, which are precisely the ones that must not sink.
  */
case class OptimizationBarrier(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): OptimizationBarrier =
    copy(child = newChild)
}

object OptimizationBarrier {

  /** Plans the barrier away: `OptimizationBarrier(child)` → `planLater(child)`.
    * The node exists only during optimization. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case OptimizationBarrier(child) => planLater(child) :: Nil
      case _ => Nil
    }
  }

  /** Idempotently register [[Strategy]] on a session. Runtime injection
    * (rather than only `SparkSessionExtensions`) so the fence also works on
    * sessions the library doesn't construct — e.g. a host application's own
    * session handed to `SparkEntry.queries`. Synchronized: the
    * contains-then-append is not atomic, and concurrent `fence()` calls
    * (or overlap with the extension-injected registration) could register
    * the strategy twice. Duplicate registration is harmless but untidy —
    * and a data race on the var is still a race. */
  def install(spark: SparkSession): Unit = synchronized {
    val em = Bridge.experimental(spark)
    if (!em.extraStrategies.contains(Strategy))
      em.extraStrategies = em.extraStrategies :+ Strategy
  }

  /** Wrap a DataFrame so downstream filters stop at this point. */
  def fence(df: DataFrame): DataFrame = {
    install(df.sparkSession)
    Bridge.ofRows(df.sparkSession, OptimizationBarrier(Bridge.analyzed(df)))
  }
}
