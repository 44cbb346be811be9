package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.functions.{EmojiOps, ShingleOps, TokenOps}

/** Property-based checks (SURVEY §5.2.5) over the native expression
  * helpers — pure JVM, no SparkSession needed. */
object NativeOpsProps extends Properties("graft.native") {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency[String](
      8 -> Gen.alphaChar.map(_.toString), 2 -> Gen.const(" "),
      1 -> Gen.const("\t"), 1 -> Gen.oneOf("😀", "🚀", "☀"))).map(_.mkString)

  private def strip(s: String): String =
    EmojiOps.strip(UTF8String.fromString(s)).toString

  property("emoji strip is idempotent") = Prop.forAll(asciiText) { s =>
    strip(strip(s)) == strip(s)
  }

  property("emoji strip output has no emoji codepoints") =
    Prop.forAll(asciiText) { s =>
      strip(s).codePoints().toArray.forall(cp => !EmojiOps.isEmoji(cp))
    }

  property("emoji strip of emoji-free text = whitespace normalize") =
    Prop.forAll(Gen.listOf(Gen.oneOf(Gen.alphaStr, Gen.const(" "))).map(_.mkString)) { s =>
      strip(s) == s.split("\\s+", -1).mkString(" ")
    }

  property("strHash31 is in [0, 2^31) and deterministic") =
    Prop.forAll(asciiText) { s =>
      val h = TokenOps.strHash31(UTF8String.fromString(s))
      h >= 0 && h < 2147483647L &&
        h == TokenOps.strHash31(UTF8String.fromString(s))
    }

  private val wordArray: Gen[Array[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee", "fff")).map(_.toArray)

  private def arr(a: Array[String]): GenericArrayData =
    new GenericArrayData(a.map(w => UTF8String.fromString(w): Any))

  property("shingles: count <= n-2 shifts, all 3 words long, distinct") =
    Prop.forAll(wordArray) { w =>
      val sh = ShingleOps.shingles(arr(w), 3)
      val out = (0 until sh.numElements()).map(sh.getUTF8String(_).toString)
      val expectedCount = math.max(0, w.length - 2)
      out.size <= expectedCount &&
        out.forall(_.split(" ").length == 3) &&
        out.distinct.size == out.size
    }

  property("shingles match the naive sliding-window set") =
    Prop.forAll(wordArray) { w =>
      val sh = ShingleOps.shingles(arr(w), 3)
      val got = (0 until sh.numElements()).map(sh.getUTF8String(_).toString).toSet
      val want = w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      got == want
    }

  property("sortedIntersectSize equals naive set intersection") =
    Prop.forAll(wordArray, wordArray) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val got = ShingleOps.sortedIntersectSize(arr(sa), arr(sb))
      got == sa.toSet.intersect(sb.toSet).size.toLong
    }
}
