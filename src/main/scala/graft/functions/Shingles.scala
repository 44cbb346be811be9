package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingles of a token array, as ONE native expression.
  *
  * The built-in formulation
  * `array_distinct(transform(sequence(0, size(w)-3), i -> concat_ws(' ',
  * w[i], w[i+1], w[i+2])))` references `w` four times; after Catalyst's
  * CollapseProject inlines `w`'s defining expression (the whole regex
  * cleaning chain), every reference re-evaluates that chain PER ELEMENT in
  * the interpreted lambda — measured 62 s for 5000 docs at sf0.1. This
  * expression takes `w` as a single child (evaluated once per row) and
  * builds the distinct shingle set in one pass — 3.5 s for the same input.
  * Insertion order (first occurrence) matches array_distinct semantics.
  */
case class ShingleSet(child: Expression, n: Int = 3) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  def apply(c: Column): Column =
    GraftColumnBridge.column(ShingleSet(GraftColumnBridge.expression(c), 3))
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleSet(GraftColumnBridge.expression(c), n))
}

object ShingleOps {
  /** Merge-count of common elements in two sorted, distinct string arrays. */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  def shingles(words: ArrayData, n: Int): ArrayData = {
    val count = words.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}
