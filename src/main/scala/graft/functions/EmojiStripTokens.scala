package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** F1 — emoji-token removal as a native Catalyst expression with codegen
  * (SURVEY §4.3 / §7.4: "custom Expression preferred for codegen").
  *
  * Semantics (exactly the reference's remove_emoji,
  * /root/reference/src/ExtractTwitterData.py:122-125, and bit-equal to the
  * higher-order-function form in Cleaning.removeEmojiTokens): split on
  * whitespace runs, drop every token containing ANY emoji codepoint, join
  * the survivors (including empty edge tokens, as split keeps them) with a
  * single space.
  *
  * Why an Expression: the HOF form (filter + rlike lambda) executes an
  * interpreted regex per token; this compiles to one static call inside
  * WholeStageCodegen with a branch-free codepoint range check — no regex,
  * no lambda interpreter, no per-token UTF8String allocation.
  */
case class EmojiStripTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def prettyName: String = "emoji_strip_tokens"

  override def nullSafeEval(input: Any): Any =
    EmojiOps.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EmojiOps.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): EmojiStripTokens =
    copy(child = newChild)
}

object EmojiStripTokens {
  /** Column wrapper for the DataFrame API. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(EmojiStripTokens(GraftColumnBridge.expression(c)))
}

/** Static helper invoked from generated code (scalac emits a static
  * forwarder, so `graft.functions.EmojiOps.strip(...)` is valid Java). */
object EmojiOps {

  /** Codepoint ranges mirrored from Cleaning.EmojiClass. */
  def isEmoji(cp: Int): Boolean =
    (cp >= 0x1F300 && cp <= 0x1FAFF) || (cp >= 0x2600 && cp <= 0x27BF) ||
    (cp >= 0x1F000 && cp <= 0x1F02F) || (cp >= 0x1F0A0 && cp <= 0x1F0FF) ||
    (cp >= 0x1F100 && cp <= 0x1F2FF) || (cp >= 0x2190 && cp <= 0x21FF) ||
    (cp >= 0x2B00 && cp <= 0x2BFF) || (cp >= 0xFE00 && cp <= 0xFE0F) ||
    cp == 0x200D

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def strip(in: UTF8String): UTF8String = {
    val s = in.toString
    val sb = new java.lang.StringBuilder(s.length)
    val tokens = Whitespace.split(s, -1)
    var first = true
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      var emoji = false
      var j = 0
      while (j < t.length && !emoji) {
        val cp = t.codePointAt(j)
        if (isEmoji(cp)) emoji = true
        j += Character.charCount(cp)
      }
      if (!emoji) {
        if (!first) sb.append(' ')
        sb.append(t)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
