package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's deterministic 31-bit string hash as a native codegen
  * expression: sum_k (k · codepoint_k) · 2654435761 mod (2³¹−1), 1-based k.
  * Bit-identical to the SQL formulation used by the DuckDB oracles
  * (`Dedup.wordHashExpr` / `wordHashSql`) — the interpreted higher-order
  * version costs a lambda-interpreter pass per string; this is one static
  * call. */
case class StrHash31(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "strhash31"

  override def nullSafeEval(input: Any): Any =
    TokenOps.strHash31(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenOps.strHash31($c)")

  override protected def withNewChildInternal(newChild: Expression): StrHash31 =
    copy(child = newChild)
}

object StrHash31 {
  def apply(c: Column): Column =
    GraftColumnBridge.column(StrHash31(GraftColumnBridge.expression(c)))
}

object TokenOps {
  /** Matches ascii(substring(s, k, 1)) semantics: k-th codepoint, 1-based. */
  def strHash31(in: UTF8String): Long = {
    val s = in.toString
    var sum = 0L
    var k = 1L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sum += k * cp
      k += 1
      i += Character.charCount(cp)
    }
    (sum * 2654435761L) % 2147483647L
  }
}
