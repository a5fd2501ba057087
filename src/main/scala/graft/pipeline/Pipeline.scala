package graft.pipeline

import graft.core._
import graft.dataset.GraftDataset
import graft.transformers._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** Operation enums mirroring the reference's transformer-family enums. */
object ops {
  sealed trait Seasonal
  object Seasonal { case object HourOfDay extends Seasonal; case object DayOfWeek extends Seasonal; case object MonthOfYear extends Seasonal }

  sealed trait Gon
  object Gon { case object Sin extends Gon; case object Cos extends Gon }

  sealed trait Scaling
  object Scaling { case object Standard extends Scaling; case object MinMax extends Scaling }

  sealed trait Arithmetic
  object Arithmetic { case object Add extends Arithmetic; case object Subtract extends Arithmetic; case object Multiply extends Arithmetic; case object Divide extends Arithmetic }

  sealed trait Comparison
  object Comparison { case object Equal extends Comparison; case object GreaterThan extends Comparison; case object GreaterOrEqual extends Comparison }

  sealed trait Agg
  object Agg { case object Min extends Agg; case object Max extends Agg; case object Sum extends Agg; case object Quantile extends Agg; case object Median extends Agg; case object Mean extends Agg; case object Std extends Agg; case object Zscore extends Agg }

  sealed trait TextSim
  object TextSim { case object DamerauLevenshtein extends TextSim; case object Jaccard extends TextSim; case object Jaro extends TextSim; case object JaroWinkler extends TextSim }

  sealed trait TextExtract
  object TextExtract { case object Length extends TextExtract; case object EmailDomain extends TextExtract; case object CharacterEntropy extends TextExtract }
}

/** Immutable feature-synthesis pipeline (reference: pipeline/pipeline.py).
  *
  * Builder methods expand transformer families over Cartesian products of resolved
  * column selections × operator lists × parameter grids, prune via [[Optimizer]], and
  * append to the current layer. `collectPlan` lowers every layer to staged Spark
  * expressions: per stage, all plain derivations execute as ONE `withColumns` (so
  * Catalyst groups same-spec window functions into shared Window nodes) and all
  * whole-dataset scalars execute as ONE aggregate + broadcast cross-join.
  */
final class Pipeline private (
    val dataset: GraftDataset,
    layers: Vector[Vector[FeatureTransformer]],
    optimizer: Optimizer,
    auxiliaryColumns: Vector[ColumnSpec]) {

  import ops._

  private def ctx: AggContext = AggContext(Nil, dataset.orderBy, None)

  // ----------------------------------------------------------------- scalar families

  def withSeasonal(subset: ColumnSelection, operations: Seq[Seasonal], angular: Boolean = false,
      periodic: Boolean = false, auxiliary: Boolean = false): Pipeline = {
    val cols = dataset.selectCols(subset)
    val gons: Seq[Option[GonTransformation]] =
      if (periodic) Seq(Some(GonTransformation.Sin), Some(GonTransformation.Cos)) else Seq(None)
    val ang = if (periodic) true else angular
    val ts = for {
      op <- orderPreservingUnique(operations)
      c <- optimizer.optimizeInputCombos(commutative = true, cols.map(Seq(_))).map(_.head)
      g <- gons
    } yield {
      val t: FeatureTransformer = op match {
        case Seasonal.HourOfDay   => HourOfDayTransformer(c, ang, g)
        case Seasonal.DayOfWeek   => DayOfWeekTransformer(c, ang, g)
        case Seasonal.MonthOfYear => MonthOfYearTransformer(c, ang, g)
      }
      Validator.validateTransformer(t, Seq(c)); t
    }
    addToCurrentLayer(ts, auxiliary)
  }

  def withTimeDiff(leftSubset: ColumnSelection, rightSubset: ColumnSelection, unit: String = "d",
      auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(expandBinary(leftSubset, rightSubset, commutative = false,
      Seq((l, r) => TimeDiffTransformer(l, r, unit))), auxiliary)

  def withPolynomial(subset: ColumnSelection, degrees: Seq[Int], auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(expandUnary(subset, commutative = true,
      degrees.map(d => (c: ColumnSpec) => PolynomialTransformer(c, d))), auxiliary)

  def withLog(subset: ColumnSelection, bases: Seq[Double], auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(expandUnary(subset, commutative = true,
      bases.map(b => (c: ColumnSpec) => LogTransformer(c, b))), auxiliary)

  def withGoniometric(subset: ColumnSelection, functions: Seq[Gon], auxiliary: Boolean = false): Pipeline = {
    val fs = orderPreservingUnique(functions).map {
      case Gon.Sin => (c: ColumnSpec) => SinTransformer(c): FeatureTransformer
      case Gon.Cos => (c: ColumnSpec) => CosTransformer(c): FeatureTransformer
    }
    addToCurrentLayer(fs.flatMap(f => expandUnary(subset, commutative = true, Seq(f))), auxiliary)
  }

  def withScaling(subset: ColumnSelection, scalings: Seq[Scaling], auxiliary: Boolean = false): Pipeline = {
    val fs = orderPreservingUnique(scalings).map {
      case Scaling.Standard => (c: ColumnSpec) => StandardScaler(c): FeatureTransformer
      case Scaling.MinMax   => (c: ColumnSpec) => MinMaxScaler(c): FeatureTransformer
    }
    addToCurrentLayer(fs.flatMap(f => expandUnary(subset, commutative = true, Seq(f))), auxiliary)
  }

  def withArithmetic(leftSubset: ColumnSelection, rightSubset: ColumnSelection,
      operations: Seq[Arithmetic], auxiliary: Boolean = false): Pipeline = {
    val ts = orderPreservingUnique(operations).flatMap {
      case Arithmetic.Add      => expandBinary(leftSubset, rightSubset, commutative = true, Seq(AddTransformer(_, _)))
      case Arithmetic.Subtract => expandBinary(leftSubset, rightSubset, commutative = false, Seq(SubtractTransformer(_, _)))
      case Arithmetic.Multiply => expandBinary(leftSubset, rightSubset, commutative = true, Seq(MultiplyTransformer(_, _)))
      case Arithmetic.Divide   => expandBinary(leftSubset, rightSubset, commutative = false, Seq(DivideTransformer(_, _)))
    }
    addToCurrentLayer(ts, auxiliary)
  }

  def withComparison(leftSubset: ColumnSelection, rightSubset: ColumnSelection,
      comparisons: Seq[Comparison], auxiliary: Boolean = false): Pipeline = {
    val ts = orderPreservingUnique(comparisons).flatMap {
      case Comparison.Equal          => expandBinary(leftSubset, rightSubset, commutative = true, Seq(EqualTransformer(_, _)))
      case Comparison.GreaterThan    => expandBinary(leftSubset, rightSubset, commutative = false, Seq(GreaterThanTransformer(_, _)))
      case Comparison.GreaterOrEqual => expandBinary(leftSubset, rightSubset, commutative = false, Seq(GreaterOrEqualTransformer(_, _)))
    }
    addToCurrentLayer(ts, auxiliary)
  }

  def withTextSimilarity(leftSubset: ColumnSelection, rightSubset: ColumnSelection,
      textSimilarities: Seq[TextSim], substrSize: Int = 2, weight: Double = 0.1,
      auxiliary: Boolean = false): Pipeline = {
    val ts = orderPreservingUnique(textSimilarities).flatMap {
      case TextSim.DamerauLevenshtein => expandBinary(leftSubset, rightSubset, commutative = true, Seq(DamerauLevenshteinSimilarityTransformer(_, _)))
      case TextSim.Jaccard            => expandBinary(leftSubset, rightSubset, commutative = true, Seq(JaccardSimilarityTransformer(_, _, substrSize)))
      case TextSim.Jaro               => expandBinary(leftSubset, rightSubset, commutative = true, Seq(JaroSimilarityTransformer(_, _)))
      case TextSim.JaroWinkler        => expandBinary(leftSubset, rightSubset, commutative = true, Seq(JaroWinklerSimilarityTransformer(_, _, weight)))
    }
    addToCurrentLayer(ts, auxiliary)
  }

  def withTextExtraction(subset: ColumnSelection, textExtractions: Seq[TextExtract],
      auxiliary: Boolean = false): Pipeline = {
    val fs = orderPreservingUnique(textExtractions).map {
      case TextExtract.Length           => (c: ColumnSpec) => TextLengthTransformer(c): FeatureTransformer
      case TextExtract.EmailDomain      => (c: ColumnSpec) => EmailDomainExtractionTransformer(c): FeatureTransformer
      case TextExtract.CharacterEntropy => (c: ColumnSpec) => CharacterEntropyTransformer(c): FeatureTransformer
    }
    addToCurrentLayer(fs.flatMap(f => expandUnary(subset, commutative = true, Seq(f))), auxiliary)
  }

  def withTextCountMatches(subset: ColumnSelection, patterns: Seq[String],
      auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(expandUnary(subset, commutative = true,
      patterns.map(p => (c: ColumnSpec) => TextCountMatchesTransformer(c, p))), auxiliary)

  // ------------------------------------------------------------ aggregating families

  def withCount(overColumnsCombinations: Seq[Seq[String]] = Nil, timeWindows: Seq[String] = Nil,
      indexColumnName: Option[String] = None, cumulative: Cum = Cum.None,
      filteringCondition: Option[Cond] = None, auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(buildAggregated(Nil, commutative = true,
      Seq(_ => CountTransformer(cumulative, filteringCondition)),
      overColumnsCombinations, timeWindows, indexColumnName), auxiliary)

  def withLagged(subset: ColumnSelection, lags: Seq[Int],
      overColumnsCombinations: Seq[Seq[String]] = Nil, fillValue: Option[Any] = None,
      auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(buildAggregated(Seq(subset), commutative = true,
      lags.map(n => (cs: Seq[ColumnSpec]) => LaggedTransformer(cs.head, n, fillValue)),
      overColumnsCombinations, Nil, None), auxiliary)

  def withFirstValue(subset: ColumnSelection, overColumnsCombinations: Seq[Seq[String]] = Nil,
      timeWindows: Seq[String] = Nil, indexColumnName: Option[String] = None,
      filteringCondition: Option[Cond] = None, auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(buildAggregated(Seq(subset), commutative = true,
      Seq(cs => FirstValueTransformer(cs.head, filteringCondition)),
      overColumnsCombinations, timeWindows, indexColumnName), auxiliary)

  def withMode(subset: ColumnSelection, overColumnsCombinations: Seq[Seq[String]] = Nil,
      timeWindows: Seq[String] = Nil, indexColumnName: Option[String] = None,
      cumulative: Cum = Cum.None, filteringCondition: Option[Cond] = None,
      auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(buildAggregated(Seq(subset), commutative = true,
      Seq(cs => ModeTransformer(cs.head, cumulative, filteringCondition)),
      overColumnsCombinations, timeWindows, indexColumnName), auxiliary)

  def withNumUnique(subset: ColumnSelection, overColumnsCombinations: Seq[Seq[String]] = Nil,
      timeWindows: Seq[String] = Nil, indexColumnName: Option[String] = None,
      cumulative: Cum = Cum.None, filteringCondition: Option[Cond] = None,
      auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(buildAggregated(Seq(subset), commutative = true,
      Seq(cs => NumUniqueTransformer(cs.head, cumulative, filteringCondition)),
      overColumnsCombinations, timeWindows, indexColumnName), auxiliary)

  def withEntityEntropy(sourceSubset: ColumnSelection, targetSubset: ColumnSelection,
      timeWindows: Seq[String] = Nil, indexColumnName: Option[String] = None,
      cumulative: Cum = Cum.None, auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(buildAggregated(Seq(sourceSubset, targetSubset), commutative = false,
      Seq(cs => EntityEntropyTransformer(cs(0), cs(1), cumulative)),
      Nil, timeWindows, indexColumnName), auxiliary)

  def withPointwiseMutualInformation(columnASubset: ColumnSelection, columnBSubset: ColumnSelection,
      overColumnsCombinations: Seq[Seq[String]] = Nil, timeWindows: Seq[String] = Nil,
      indexColumnName: Option[String] = None, cumulative: Cum = Cum.None,
      filteringCondition: Option[Cond] = None, auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(buildAggregated(Seq(columnASubset, columnBSubset), commutative = true,
      Seq(cs => PmiTransformer(cs(0), cs(1), cumulative, filteringCondition)),
      overColumnsCombinations, timeWindows, indexColumnName), auxiliary)

  def withArithmeticAggregation(subset: ColumnSelection, aggregations: Seq[Agg],
      overColumnsCombinations: Seq[Seq[String]] = Nil, timeWindows: Seq[String] = Nil,
      indexColumnName: Option[String] = None, cumulative: Cum = Cum.None,
      filteringCondition: Option[Cond] = None, quantiles: Seq[Double] = Nil,
      auxiliary: Boolean = false): Pipeline = {
    val fc = filteringCondition
    val factoriesPerOp: Seq[Seq[Seq[ColumnSpec] => AggregatingTransformer]] =
      orderPreservingUnique(aggregations).map {
        case Agg.Min    => Seq((cs: Seq[ColumnSpec]) => MinTransformer(cs.head, cumulative, fc))
        case Agg.Max    => Seq((cs: Seq[ColumnSpec]) => MaxTransformer(cs.head, cumulative, fc))
        case Agg.Sum    => Seq((cs: Seq[ColumnSpec]) => SumTransformer(cs.head, cumulative, fc))
        case Agg.Median => Seq((cs: Seq[ColumnSpec]) => MedianTransformer(cs.head, cumulative, fc))
        case Agg.Mean   => Seq((cs: Seq[ColumnSpec]) => MeanTransformer(cs.head, cumulative, fc))
        case Agg.Std    => Seq((cs: Seq[ColumnSpec]) => StdTransformer(cs.head, cumulative, fc))
        case Agg.Zscore => Seq((cs: Seq[ColumnSpec]) => ZscoreTransformer(cs.head, cumulative, fc))
        case Agg.Quantile =>
          require(quantiles.nonEmpty, "Agg.Quantile requires quantiles=...")
          quantiles.map(q => (cs: Seq[ColumnSpec]) => QuantileTransformer(cs.head, q, cumulative, fc))
      }
    val ts = factoriesPerOp.flatMap(fs =>
      buildAggregated(Seq(subset), commutative = true, fs, overColumnsCombinations, timeWindows, indexColumnName))
    addToCurrentLayer(ts, auxiliary)
  }

  def withArgmin(valueSubset: ColumnSelection, argSubset: ColumnSelection,
      overColumnsCombinations: Seq[Seq[String]] = Nil, timeWindows: Seq[String] = Nil,
      indexColumnName: Option[String] = None, cumulative: Cum = Cum.None,
      filteringCondition: Option[Cond] = None, auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(buildAggregated(Seq(valueSubset, argSubset), commutative = false,
      Seq(cs => ArgMinTransformer(cs(0), cs(1), cumulative, filteringCondition)),
      overColumnsCombinations, timeWindows, indexColumnName), auxiliary)

  def withArgmax(valueSubset: ColumnSelection, argSubset: ColumnSelection,
      overColumnsCombinations: Seq[Seq[String]] = Nil, timeWindows: Seq[String] = Nil,
      indexColumnName: Option[String] = None, cumulative: Cum = Cum.None,
      filteringCondition: Option[Cond] = None, auxiliary: Boolean = false): Pipeline =
    addToCurrentLayer(buildAggregated(Seq(valueSubset, argSubset), commutative = false,
      Seq(cs => ArgMaxTransformer(cs(0), cs(1), cumulative, filteringCondition)),
      overColumnsCombinations, timeWindows, indexColumnName), auxiliary)

  // ------------------------------------------------------------------------ plumbing

  def withNewLayer(): Pipeline = {
    val newSchema = FeatureSchema.of(currentLayer.map(_.outputSpec))
    new Pipeline(dataset.withSchema(newSchema), layers :+ Vector.empty, optimizer, auxiliaryColumns)
  }

  /** Rolling index columns used anywhere in a transformer's wrapper chain. */
  private def rollingIndexes(t: FeatureTransformer): Seq[String] = t match {
    case r: RollingWrapper => r.indexColumn.name +: rollingIndexes(r.inner)
    case o: OverWrapper    => rollingIndexes(o.inner)
    case _                 => Nil
  }

  /** Lower all layers to a Spark plan. Still lazy — no action is triggered.
    *
    * Sort alignment: a layer whose rolling windows roll on the leading order column
    * materializes that column's epoch-seconds twin ([[AggContext.alignedName]]) and
    * orders EVERY window in the layer by it first — one physical Sort then serves the
    * row-frame and the range-frame families alike (see [[AggContext.seqW]]). If the
    * caller already materialized the twin, it is reused and kept; otherwise it is
    * created per layer and dropped.
    */
  def collectPlan(cacheComputation: Boolean = false): GraftDataset = {
    val namer = new TempNamer
    var df = dataset.df
    layers.foreach { layer =>
      val align = dataset.orderBy.headOption
        .filter(idx => layer.exists(t => rollingIndexes(t).contains(idx)))
      align match {
        case Some(idx) =>
          val name = AggContext.alignedName(idx)
          val preexisting = df.columns.contains(name)
          // ALWAYS (re)materialize the canonical expression — never trust a
          // same-named column's values: idempotent when the caller pre-materialized
          // it correctly (windows resolve the name to this fresh attribute either
          // way, so the sort is still shared), self-healing when something stale
          // sits under the reserved `__graft_` namespace. `preexisting` only
          // decides ownership: a caller-provided twin stays in the frame for the
          // caller's own windows; a pipeline-created one is dropped.
          df = df.withColumn(name, col(idx).cast("timestamp").cast("long"))
          df = FeatureExec.applyPlans(df,
            layer.map(_.plan(ctx.copy(alignedIndex = Some(idx)), namer)))
          if (!preexisting) df = df.drop(name)
        case None =>
          df = FeatureExec.applyPlans(df, layer.map(_.plan(ctx, namer)))
      }
    }
    val currentOut = FeatureSchema.of(currentLayer.map(_.outputSpec))
    var out = GraftDataset(df, dataset.schema ++ currentOut, dataset.orderBy)
    out = out.drop(auxiliaryColumns)
    if (cacheComputation) out.cached else out
  }

  def toDF(cacheComputation: Boolean = false): DataFrame = collectPlan(cacheComputation).df

  def sinkParquet(path: String): Unit = collectPlan().sinkParquet(path)

  def describe(): String = {
    val result = collectPlan()
    val sb = new StringBuilder
    sb.append("\n\n\nPipeline Breakdown\n").append("=" * 80).append('\n')
    val generated = layers.flatten.map(_.outputSpec).filterNot(auxiliaryColumns.contains)
    val initial = result.schema.drop(generated)
    sb.append(s"\nInitial Schema: ${initial.numColumns} columns\n")
    initial.columns.foreach(c => sb.append(s"  - ${c.name} | ${c.colType} | ${c.role}\n"))
    sb.append("-" * 80).append('\n')
    layers.zipWithIndex.foreach { case (layer, i) =>
      val isCurrent = i == layers.size - 1
      sb.append(s"Layer ${i + 1}${if (isCurrent) " [Current]" else ""}: ${layer.size} transformers\n")
      layer.foreach { t =>
        val aux = if (auxiliaryColumns.contains(t.outputSpec)) " [AUXILIARY]" else ""
        sb.append(s"  -> ${t.outputName} | Type: ${t.returnType}$aux\n")
      }
    }
    sb.append("-" * 80).append('\n')
    sb.append(s"Final Schema: ${result.schema.numColumns} columns\n")
    sb.append("Summary:\n")
    sb.append(s"  Total Layers:                                  ${layers.size}\n")
    sb.append(s"  Initial Column Count:                          ${initial.numColumns}\n")
    sb.append(s"  Total Features Created (of which auxiliary):   ${layers.flatten.size} (${auxiliaryColumns.size})\n")
    sb.append(s"  Final Column Count:                            ${result.schema.numColumns}\n")
    sb.append("=" * 80)
    sb.toString
  }

  /** Spark physical plan of the lowered pipeline — the engine-level `describe`. */
  def explain(): String = collectPlan().df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)

  // ------------------------------------------------------------------------ internals

  private def currentLayer: Vector[FeatureTransformer] = layers.last

  private def addToCurrentLayer(ts: Seq[FeatureTransformer], auxiliary: Boolean): Pipeline = {
    val deduped = optimizer.deduplicateAgainstLayers(
      dataset.schema ++ FeatureSchema.of(currentLayer.map(_.outputSpec)), ts)
    val newAux = if (auxiliary) auxiliaryColumns ++ deduped.map(_.outputSpec) else auxiliaryColumns
    new Pipeline(dataset, layers.init :+ (currentLayer ++ deduped), optimizer, newAux)
  }

  private def orderPreservingUnique[T](xs: Seq[T]): Seq[T] = xs.distinct

  private def expandUnary(subset: ColumnSelection, commutative: Boolean,
      kwFactories: Seq[ColumnSpec => FeatureTransformer]): Vector[FeatureTransformer] = {
    val combos = optimizer.optimizeInputCombos(commutative, dataset.selectCols(subset).map(Seq(_)))
    combos.toVector.flatMap { c =>
      kwFactories.map { f => val t = f(c.head); Validator.validateTransformer(t, c); t }
    }
  }

  private def expandBinary(left: ColumnSelection, right: ColumnSelection, commutative: Boolean,
      kwFactories: Seq[(ColumnSpec, ColumnSpec) => FeatureTransformer]): Vector[FeatureTransformer] = {
    val ls = dataset.selectCols(left); val rs = dataset.selectCols(right)
    val combos = optimizer.optimizeInputCombos(commutative,
      for (l <- ls; r <- rs) yield Seq(l, r))
    combos.toVector.flatMap { c =>
      kwFactories.map { f => val t = f(c(0), c(1)); Validator.validateTransformer(t, c); t }
    }
  }

  /** Expand an aggregating family, then wrap Rolling (inner×window) then Over
    * (inner×combination), mirroring pipeline.py:514-586 including the "invalid entry
    * keeps the unwrapped variant" rule for empty over-combinations.
    */
  private def buildAggregated(subsets: Seq[ColumnSelection], commutative: Boolean,
      kwFactories: Seq[Seq[ColumnSpec] => AggregatingTransformer],
      overCombos: Seq[Seq[String]], timeWindows: Seq[String],
      indexColumnName: Option[String]): Vector[AggregatingTransformer] = {
    val resolvedOver = overCombos.map(c => c.map(n => dataset.columnByName(n).name))
    val indexCol = indexColumnName.map(dataset.columnByName)
    Validator.validateTimeWindowIndexColumn(timeWindows.map(Option(_)), indexCol)

    val inputSets: Seq[Seq[ColumnSpec]] = subsets.map(dataset.selectCols(_).toSeq)
    val combos: Seq[Seq[ColumnSpec]] =
      if (inputSets.isEmpty) Seq(Seq.empty)
      else inputSets.foldLeft(Seq(Seq.empty[ColumnSpec])) { (acc, set) =>
        for (a <- acc; s <- set) yield a :+ s
      }
    val optimized = optimizer.optimizeInputCombos(commutative, combos)

    val base: Vector[AggregatingTransformer] = optimized.toVector.flatMap { c =>
      kwFactories.map { f => val t = f(c); Validator.validateTransformer(t, c); t }
    }

    val rolled: Vector[AggregatingTransformer] = (indexCol, timeWindows) match {
      case (Some(idx), ws) if ws.nonEmpty =>
        // an invalid (null/empty) window entry keeps the UNWRAPPED variant alongside
        // the valid rollings — reference pipeline.py:562-586 (_get_rolling_transformers),
        // same rule the over-combination branch below applies to empty combos
        val valid = ws.filter(w => w != null && w.nonEmpty)
        val keepPlain = valid.size != ws.size
        (if (keepPlain) base else Vector.empty) ++
          base.flatMap(inner => valid.map(w => RollingWrapper(inner, idx, w)))
      case _ => base
    }

    if (resolvedOver.isEmpty) rolled
    else {
      val valid = resolvedOver.filter(_.nonEmpty)
      val keepPlain = valid.size != resolvedOver.size
      val wrapped = rolled.flatMap(inner => valid.map(oc => OverWrapper(inner, oc)))
      (if (keepPlain) rolled else Vector.empty) ++ wrapped
    }
  }
}

object Pipeline {
  def apply(dataset: GraftDataset,
      optimizationLevel: OptimizationLevel = OptimizationLevel.None,
      transformers: Vector[Vector[FeatureTransformer]] = Vector(Vector.empty)): Pipeline =
    new Pipeline(dataset, transformers, new Optimizer(optimizationLevel), Vector.empty)
}
