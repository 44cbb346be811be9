package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen expressions for the similarity hot path (SURVEY §4.3:
  * "custom Expression beats UDF beats anything else").
  *
  * The built-in formulation — `aggregate(zip_with(a, b, *), 0, +)` — runs
  * the lambda interpreter per element per pair: at N·|Q| pairs × 64 dims
  * that's the inner loop of the whole operator. These compile to one static
  * call over the unsafe array data (no per-element boxing, no allocation
  * except the quantize output).
  */

/** Exact integer dot product of two ARRAY<BIGINT> columns. */
case class QDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"

  override def nullSafeEval(a: Any, b: Any): Any =
    EmbedOps.qdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.EmbedOps.qdot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDotProduct =
    copy(left = newLeft, right = newRight)
}

/** floor(x·10⁶) quantization of ARRAY<FLOAT>/ARRAY<DOUBLE> → ARRAY<BIGINT>
  * (the cross-engine-exact embedding representation; see Similarity). */
case class QuantizeVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_vec"

  private lazy val fromDouble: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    if (fromDouble) EmbedOps.quantizeD(input.asInstanceOf[ArrayData])
    else EmbedOps.quantizeF(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (fromDouble) "quantizeD" else "quantizeF"
    defineCodeGen(ctx, ev, c => s"graft.functions.EmbedOps.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeVector =
    copy(child = newChild)
}

object QDot {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(QDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def quantize(c: Column): Column =
    GraftColumnBridge.column(QuantizeVector(GraftColumnBridge.expression(c)))
}

/** Static helpers invoked from generated code. */
object EmbedOps {
  def qdot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  def quantizeF(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = math.floor(a.getFloat(i).toDouble * 1000000.0).toLong; i += 1 }
    new GenericArrayData(out)
  }

  def quantizeD(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = math.floor(a.getDouble(i) * 1000000.0).toLong; i += 1 }
    new GenericArrayData(out)
  }
}
