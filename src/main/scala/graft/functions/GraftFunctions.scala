package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's native expressions exposed to SQL. Two routes:
  *  - production: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) at session build time;
  *  - retrofit: `GraftFunctions.registerAll(spark)` on a running session.
  * After either, `SELECT emoji_strip_tokens(text)`, `qdot(a, b)` and
  * `quantize_vec(v)` work in plain SQL. */
object GraftFunctions {

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("emoji_strip_tokens",
      "drops every whitespace token containing an emoji codepoint",
      exprs => EmojiStripTokens(exprs.head)),
    ("qdot",
      "exact integer dot product of two ARRAY<BIGINT> vectors",
      exprs => QDotProduct(exprs(0), exprs(1))),
    ("quantize_vec",
      "floor(x*1e6) quantization of a float/double array to ARRAY<BIGINT>",
      exprs => QuantizeVector(exprs.head)))

  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      GraftColumnBridge.registerFunction(spark, name, builder)
    }
}

/** Builder-time injection (the public SparkSessionExtensions API). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage), builder))
    }
}
