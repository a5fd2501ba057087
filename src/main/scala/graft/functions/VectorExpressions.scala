package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Element access for numeric arrays of any primitive type, dispatched on a
  * codegen-constant tag (the tag is embedded as a literal in generated code, so the
  * JIT folds the switch away per compiled call site). This is what lets the vector
  * kernels accept array&lt;int&gt; / array&lt;long&gt; (quantized embeddings) with the
  * same arithmetic the old `aggregate(zip_with(.. cast("double") ..))` formulation
  * applied — every element is widened to double before any multiply.
  */
object NumArrays {
  final val TDouble = 0
  final val TFloat  = 1
  final val TLong   = 2
  final val TInt    = 3
  final val TShort  = 4
  final val TByte   = 5

  def tagOf(t: DataType, who: String): Int = t match {
    case ArrayType(DoubleType, _)  => TDouble
    case ArrayType(FloatType, _)   => TFloat
    case ArrayType(LongType, _)    => TLong
    case ArrayType(IntegerType, _) => TInt
    case ArrayType(ShortType, _)   => TShort
    case ArrayType(ByteType, _)    => TByte
    case other => throw new IllegalArgumentException(
      s"$who needs an array of a primitive numeric element type, got $other")
  }

  def isSupported(t: DataType): Boolean = t match {
    case ArrayType(DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType, _) => true
    case _ => false
  }

  /** Analysis-time check shared by the vector kernels: misuse (array&lt;string&gt;, a
    * non-array, …) should fail as an AnalysisException at plan time, not as a class
    * cast / IllegalArgumentException at codegen or execution time.
    */
  def checkInput(who: String, t: DataType): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isSupported(t)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$who needs an array of a primitive numeric element type, got ${t.catalogString}")

  def get(a: ArrayData, tag: Int, i: Int): Double = tag match {
    case TDouble => a.getDouble(i)
    case TFloat  => a.getFloat(i).toDouble
    case TLong   => a.getLong(i).toDouble
    case TInt    => a.getInt(i).toDouble
    case TShort  => a.getShort(i).toDouble
    case _       => a.getByte(i).toDouble
  }
}

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
  def cosineBoxed(a: ArrayData, aTag: Int, b: ArrayData, bTag: Int): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dotAb = 0.0; var dotAa = 0.0; var dotBb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = NumArrays.get(a, aTag, i)
      val y = NumArrays.get(b, bTag, i)
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

/** Codegen'd cosine similarity of two numeric arrays (any primitive numeric element
  * type, independently per side — float embeddings and int-quantized embeddings both
  * work, like the HOF formulation this replaced).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = NumArrays.checkInput("cosine left side", left.dataType)
    if (l.isFailure) l else NumArrays.checkInput("cosine right side", right.dataType)
  }

  private lazy val lTag = NumArrays.tagOf(left.dataType, "cosine left side")
  private lazy val rTag = NumArrays.tagOf(right.dataType, "cosine right side")

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineBoxed(a.asInstanceOf[ArrayData], lTag, b.asInstanceOf[ArrayData], rTag)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("graftCos")
      s"""
      java.lang.Double $tmp = graft.functions.VectorKernels.cosineBoxed($a, $lTag, $b, $rTag);
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
