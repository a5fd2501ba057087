package graft.pipeline

import graft.core._

/** Meta-level plan optimizations (reference: pipeline/optimizer.py). These prune the
  * *generated feature set* before any Spark plan exists; Catalyst handles everything
  * below the feature level.
  */
sealed abstract class OptimizationLevel(val level: Int) extends Ordered[OptimizationLevel] {
  def compare(that: OptimizationLevel): Int = level.compare(that.level)
}
object OptimizationLevel {
  case object None extends OptimizationLevel(0)
  case object SkipSelf extends OptimizationLevel(1)
  case object DeduplicateCommutative extends OptimizationLevel(2)
}

final class Optimizer(val optimizationLevel: OptimizationLevel) {

  /** Always-on: never add a transformer whose output column spec already exists in the
    * schema or the pending layer (optimizer.py:24-35).
    */
  def deduplicateAgainstLayers(schema: FeatureSchema,
      additions: Seq[FeatureTransformer]): Vector[FeatureTransformer] = {
    val present = scala.collection.mutable.Set[ColumnSpec](schema.columns: _*)
    val out = Vector.newBuilder[FeatureTransformer]
    additions.foreach { t =>
      val spec = t.outputSpec
      if (!present.contains(spec)) { present += spec; out += t }
    }
    out.result()
  }

  /** SKIP_SELF: drop combinations with repeated columns; DEDUPLICATE_COMMUTATIVE: keep
    * one of (x,y)/(y,x) for commutative transformers (optimizer.py:37-64).
    */
  def optimizeInputCombos(commutative: Boolean,
      combos: Seq[Seq[ColumnSpec]]): Seq[Seq[ColumnSpec]] = {
    var result = combos
    if (optimizationLevel >= OptimizationLevel.SkipSelf)
      result = result.filter(c => c.distinct.size == c.size)
    if (optimizationLevel >= OptimizationLevel.DeduplicateCommutative && commutative) {
      val seen = scala.collection.mutable.Set[Seq[String]]()
      result = result.filter { c =>
        val key = c.map(_.name).sorted
        if (seen.contains(key)) false else { seen += key; true }
      }
    }
    result
  }
}

/** Static validation (reference: pipeline/validator.py). */
object Validator {
  def validateTimeWindowIndexColumn(timeWindows: Seq[Option[String]],
      indexColumn: Option[ColumnSpec]): Unit = {
    if (timeWindows.nonEmpty && timeWindows.head.isDefined && indexColumn.isEmpty)
      throw new IllegalArgumentException("Time window specified without index column.")
    indexColumn.foreach { c =>
      if (c.colType != ColType.Datetime)
        throw new IllegalArgumentException(
          s"Currently only DATETIME columns are supported for rolling aggregation but ${c.colType} was passed for ${c.name}.")
    }
  }

  def validateTransformer(t: FeatureTransformer, inputColumns: Seq[ColumnSpec]): Unit = {
    if (t.skipValidation) return
    val expected = t.inputTypes
    if (inputColumns.size != expected.size)
      throw new IllegalArgumentException(
        s"Transformer $t expected ${expected.size} input columns, but received ${inputColumns.size}.")
    inputColumns.zip(expected).foreach { case (c, sel) =>
      if (!sel.matches(c))
        throw new IllegalArgumentException(
          s"Column '${c.name}' has type '${c.colType}', but transformer $t expected one of '${sel.types}'.")
    }
  }
}
