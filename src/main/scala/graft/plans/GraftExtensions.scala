package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Production registration point for the library's custom operators — the
  * `SparkSessionExtensions` injector Spark loads from configuration:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions …
  *   // or programmatically:
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * }}}
  *
  * Injects both whole custom operators (the as-of join and the interval
  * sweep join: LogicalPlan node → planner Strategy → SparkPlan) and their
  * column-pruning optimizer rules. This is the cluster-deployment path —
  * every session in the application gets the operators at build time,
  * including sessions the library never touches. The per-call
  * `ensureStrategy` registrations in [[AsOfJoinNative]] /
  * [[IntervalJoinNative]] stay as the fallback for sessions built WITHOUT
  * the extension (e.g. a driver-owned session handed to the library);
  * both paths are idempotent and coexist: `extraStrategies` and injected
  * strategies are concatenated by the planner, and planning strategies /
  * rules are no-ops on plans without the custom nodes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => IntervalJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfJoinPruningRule)
    ext.injectOptimizerRule(_ => IntervalJoinPruningRule)
  }
}
