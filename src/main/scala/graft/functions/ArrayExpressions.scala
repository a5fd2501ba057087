package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Mode of an array with the reference's tie-break: among the most frequent values the
  * LARGEST wins (aggregating_transformers.py:136 `mode().sort(descending=True).first()`).
  * Used for time-rolling mode where the per-row window contents must be aggregated
  * whole (`collect_list` over the range frame → ArrayMode), matching Polars' semantics
  * of evaluating the full inner expression per window.
  */
case class ArrayMode(child: Expression) extends UnaryExpression with CodegenFallback {
  private lazy val elementType: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = elementType
  override def nullable: Boolean = true

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(elementType)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new java.util.HashMap[Any, Integer]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) counts.merge(arr.get(i, elementType), 1, (a, b) => a + b)
      i += 1
    }
    if (counts.isEmpty) return null
    var best: Any = null
    var bestCount = -1
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      if (c > bestCount || (c == bestCount && ordering.compare(e.getKey, best) > 0)) {
        best = e.getKey; bestCount = c
      }
    }
    best
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object arrayfns {
  def arrayMode(c: Column): Column = ColumnBridge.column(ArrayMode(ColumnBridge.expression(c)))
}
