package graft.selection

import graft.core._
import graft.dataset.GraftDataset
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Feature-vs-label scoring and top-k selection (reference:
  * feature_selection/feature_selector.py).
  *
  * All three methods are one or two distributed aggregations producing a tiny
  * driver-side report — the shape that scales: no per-feature job, one pass computing
  * every feature's statistic simultaneously.
  */
sealed abstract class SelectionMethod(val label: String)
object SelectionMethod {
  case object Correlation extends SelectionMethod("Correlation")
  case object TTest extends SelectionMethod("T-Test")
  case object ChiSquared extends SelectionMethod("Chi-Squared")
}

final case class SelectionReport(method: SelectionMethod, stats: Seq[(String, Double)]) {
  def toMap: Map[String, Double] = stats.toMap
}

object FeatureSelector {
  import SelectionMethod._

  private val supportedFeatureTypes: Map[SelectionMethod, Set[ColType]] = Map(
    Correlation -> Set(ColType.Numeric, ColType.Boolean, ColType.Ordinal),
    TTest -> Set(ColType.Numeric, ColType.Boolean, ColType.Ordinal),
    ChiSquared -> Set(ColType.Boolean, ColType.Ordinal, ColType.Nominal))

  private val supportedLabelTypes: Map[SelectionMethod, Set[ColType]] = Map(
    Correlation -> Set(ColType.Numeric, ColType.Boolean),
    TTest -> Set(ColType.Boolean),
    ChiSquared -> Set(ColType.Boolean, ColType.Ordinal, ColType.Nominal))

  def getReport(dataset: GraftDataset, featureSubset: ColumnSelection,
      method: SelectionMethod): SelectionReport = {
    val label = dataset.labelColumn
    val features = dataset.selectCols(featureSubset)
    checkTypes(features, label, method)
    val names = features.map(_.name)
    val stats = method match {
      case Correlation => correlation(dataset.df, names, label.name)
      case TTest       => tTest(dataset.df, names, label.name)
      case ChiSquared  => chiSquared(dataset.df, names, label.name)
    }
    SelectionReport(method, stats)
  }

  /** Rank by (stat desc, name asc) — the reference's deterministic tie-break
    * (feature_selector.py:59-61) — and take top-k or frac.
    */
  def selectFeatures(report: SelectionReport, topK: Option[Int] = None,
      frac: Option[Double] = None): Seq[String] = {
    val n = (topK, frac) match {
      case (Some(_), Some(_)) | (None, None) =>
        throw new IllegalArgumentException("Exactly one of k or frac must be specified")
      case (Some(k), None) =>
        if (k < 1) throw new IllegalArgumentException(s"k must be at least 1 but $k was given.")
        k
      case (None, Some(f)) =>
        if (f < 0 || f > 1) throw new IllegalArgumentException(s"frac must be between 0 and 1 but $f was given.")
        (f * report.stats.size).toInt
    }
    report.stats.sortBy { case (name, stat) => (-stat, name) }.take(n).map(_._1)
  }

  /** |Pearson r| per feature vs label, NaN→0, in ONE aggregation pass. Computed from
    * covariance/stddevs with an explicit zero-variance guard so it is safe under both
    * ANSI and non-ANSI sessions (Polars fills NaN→0 there; reference
    * feature_selector.py:87).
    */
  private def correlation(df: DataFrame, features: Seq[String], label: String): Seq[(String, Double)] = {
    val lbl = col(label).cast("double")
    val aggs = features.map { f =>
      val d = col(f).cast("double")
      val denom = stddev_samp(d) * stddev_samp(lbl)
      when(denom === 0.0 || denom.isNull, lit(null)).otherwise(covar_samp(d, lbl) / denom).as(f)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    features.zipWithIndex.map { case (f, i) =>
      val v = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
      f -> (if (v.isNaN) 0.0 else math.abs(v))
    }
  }

  /** |μ₁−μ₀| / sqrt(σ₁²/n₁ + σ₀²/n₀) from per-class means/vars; NaN→0, exact
    * separation → +Inf (golden: test_feature_selector.py:116).
    */
  private def tTest(df: DataFrame, features: Seq[String], label: String): Seq[(String, Double)] = {
    val lbl = col(label).cast("boolean")
    val aggs = features.flatMap { f =>
      val d = col(f).cast("double")
      Seq(avg(d).as(s"${f}_mean"), var_samp(d).as(s"${f}_var"))
    } :+ count(lit(1)).as("cnt")
    val byClass: Map[Boolean, Row] =
      df.where(lbl.isNotNull).groupBy(lbl.as("__lbl")).agg(aggs.head, aggs.tail: _*)
        .collect().map(r => r.getBoolean(0) -> r).toMap
    // single-class (or empty) input: the statistic is undefined → 0, matching the
    // reference's NaN→0 fill rather than throwing
    (byClass.get(true), byClass.get(false)) match {
      case (Some(t), Some(fRow)) =>
        def get(r: Row, name: String): Double = {
          val i = r.fieldIndex(name)
          if (r.isNullAt(i)) Double.NaN else r.getDouble(i)
        }
        val nT = t.getLong(t.fieldIndex("cnt")).toDouble
        val nF = fRow.getLong(fRow.fieldIndex("cnt")).toDouble
        features.map { f =>
          val meanDiff = math.abs(get(t, s"${f}_mean") - get(fRow, s"${f}_mean"))
          val denom = math.sqrt(get(t, s"${f}_var") / nT + get(fRow, s"${f}_var") / nF)
          val stat = meanDiff / denom
          f -> (if (stat.isNaN) 0.0 else stat)
        }
      case _ => features.map(_ -> 0.0)
    }
  }

  /** Pearson χ² statistic for EVERY feature from ONE distributed pass: features melt
    * to (feature, value, label) via explode, a single groupBy builds all the
    * contingencies at once, and the per-feature χ² folds the (small) collected
    * result — N features cost one Spark job, not N.
    */
  private def chiSquared(df: DataFrame, features: Seq[String], label: String): Seq[(String, Double)] = {
    val fv = explode(array(features.map(f =>
      struct(lit(f).as("f"), col(f).cast("string").as("v"))): _*))
    val ct = df.select(col(label).cast("string").as("l"), fv.as("fv"))
      .groupBy(col("fv.f").as("f"), col("fv.v").as("v"), col("l"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val byFeature = ct.groupBy(_.getString(0))
    features.map { f =>
      val cells = byFeature.getOrElse(f, Array.empty)
        .map(r => (r.getString(1), r.getString(2), r.getLong(3).toDouble))
      val total = cells.map(_._3).sum
      val rowTot = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val colTot = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val obs = cells.map(c => (c._1, c._2) -> c._3).toMap
      var chi2 = 0.0
      for (fvl <- rowTot.keys; lv <- colTot.keys) {
        val o = obs.getOrElse((fvl, lv), 0.0)
        val exp = rowTot(fvl) * colTot(lv) / total
        if (exp > 0) chi2 += (o - exp) * (o - exp) / exp
      }
      f -> chi2
    }
  }

  private def checkTypes(features: Seq[ColumnSpec], label: ColumnSpec, method: SelectionMethod): Unit = {
    if (!supportedLabelTypes(method).contains(label.colType))
      throw new IllegalArgumentException(
        s"${method.label} can only be computed with label column of type ${supportedLabelTypes(method)}, " +
          s"but ${label.name} is of type ${label.colType}.")
    features.find(f => !supportedFeatureTypes(method).contains(f.colType)).foreach { f =>
      throw new IllegalArgumentException(
        s"${method.label} can only be computed for ${supportedFeatureTypes(method)} columns, " +
          s"but ${f.name} is of type ${f.colType}.")
    }
  }
}
