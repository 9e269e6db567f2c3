package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.GraftFunctions

/** SparkSessionExtensions entry point: registers the custom expressions as
  * SQL functions and injects the engine's optimizer rules, so the
  * operators are reachable from pure SQL as well as the Column API:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT gunzip_if_gzip(data), simhash64(tokens) FROM ...
  *
  * (Also invokable on an existing session via
  * [[graft.functions.GraftFunctions.register]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.GzipRoundtripElimination)
    ext.injectPlannerStrategy(_ => graft.plans.OptimizationBarrier.Strategy)
    GraftFunctions.sqlFunctions.foreach { case (name, usage, build) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        (es: Seq[Expression]) => build(es.head)))
    }
  }
}
