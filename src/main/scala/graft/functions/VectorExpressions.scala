package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense-vector kernels for the ANN / embedding-dedup family.
  *
  * The arithmetic is EXACTLY the sequential double left-fold the previous
  * higher-order-function formulation used (`aggregate(zip_with(a, b, p·q), 0.0, +)`),
  * which is also what DuckDB's `list_dot_product` over `DOUBLE[]` computes — so the
  * cross-engine oracles stay bit-identical while the per-pair cost drops from ~400
  * interpreted lambda calls to one tight JVM loop.
  */
object VectorKernels {
  /** Cosine similarity; null if either vector contains a null element (matching the
    * HOF formulation, where a null element nulls the fold). 0-length or all-zero
    * vectors yield NaN via 0/0, as before.
    */
  def cosineBoxed(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dotAb = 0.0; var dotAa = 0.0; var dotBb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dotAb += x * y
      dotAa += x * x
      dotBb += y * y
      i += 1
    }
    // HOF zip_with pads the SHORTER side with nulls → the fold nulls out; match that
    if (a.numElements() != b.numElements()) return null
    java.lang.Double.valueOf(dotAb / (math.sqrt(dotAa) * math.sqrt(dotBb)))
  }
}

/** Codegen'd cosine similarity of two numeric arrays (float or double, independently
  * per side).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression, side: String): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"cosine $side side needs array<float> or array<double>, got $t")
  }
  private lazy val lFloat = isFloat(left, "left")
  private lazy val rFloat = isFloat(right, "right")

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineBoxed(a.asInstanceOf[ArrayData], lFloat, b.asInstanceOf[ArrayData], rFloat)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("graftCos")
      s"""
      java.lang.Double $tmp = graft.functions.VectorKernels.cosineBoxed($a, $lFloat, $b, $rFloat);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object vecfns {
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
