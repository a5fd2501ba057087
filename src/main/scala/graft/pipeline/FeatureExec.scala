package graft.pipeline

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Lowers one layer of feature plans onto a DataFrame.
  *
  * Per stage index, all plain derivations run as ONE `withColumns` — putting every
  * same-spec window expression in a single projection so Catalyst's
  * ExtractWindowExpressions groups them into shared Window nodes — and all
  * whole-dataset scalars run as ONE aggregate + broadcast cross-join.
  */
object FeatureExec {
  def applyPlans(df0: DataFrame, plans: Seq[FeaturePlan]): DataFrame = {
    var df = df0
    val maxDepth = if (plans.isEmpty) 0 else plans.map(_.stages.length).max
    (0 until maxDepth).foreach { i =>
      val items = plans.flatMap(_.stages.lift(i).getOrElse(Vector.empty))
      val derived = items.collect { case d: Derived => d }
      val scalars = items.collect { case g: GlobalScalar => g }
      if (derived.nonEmpty)
        df = df.withColumns(derived.map(d => d.name -> d.column).toMap)
      if (scalars.nonEmpty)
        // the aggregate branch re-evaluates the upstream plan, but Catalyst prunes it
        // to ONLY the scalar input columns — at scale that second pass is a narrow
        // column scan, much cheaper than persisting the full (wide) upstream would
        // be. When upstream layers are compute-heavy rather than scan-heavy, callers
        // opt in via GraftDataset.cache() before building this layer.
        df = df.crossJoin(broadcast(df.groupBy().agg(
          scalars.head.agg.as(scalars.head.name),
          scalars.tail.map(g => g.agg.as(g.name)): _*)))
    }
    if (plans.nonEmpty) {
      df = df.withColumns(plans.map(p => p.outputName -> p.output).toMap)
      val temps = plans.flatMap(_.tempNames)
      if (temps.nonEmpty) df = df.drop(temps: _*)
    }
    df
  }

  def applyTransformers(df: DataFrame, ctx: AggContext, ts: Seq[FeatureTransformer]): DataFrame = {
    val namer = new TempNamer
    applyPlans(df, ts.map(_.plan(ctx, namer)))
  }
}
