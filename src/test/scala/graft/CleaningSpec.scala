package graft

import org.apache.spark.sql.functions.col
import graft.functions.Cleaning

/** F1–F7 semantics (SURVEY §2.3) on handwritten strings, including the
  * order-of-application traps in SURVEY §7.5.5. */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("text").select(Cleaning.cleanText(col("text")).as("c"))
      .collect().head.getString(0)

  test("F2: URLs removed") {
    assert(clean("see http://x.co/abc now") == "see now")
    assert(clean("https://a.b c") == "c")
  }

  test("F3: @usernames removed") {
    assert(clean("hi @user_1 bye") == "hi bye")
  }

  test("F4: covid words removed case-insensitively, whole-word, before lowering") {
    assert(clean("COVID-19 Covid19 covid_19 CoViD spread") == "spread")
    // 'covidious' is not a whole-word match
    assert(clean("covidious stays") == "covidious stays")
  }

  test("F1: whole token containing an emoji is dropped, not just the char") {
    assert(clean("good😀day here") == "here")
    assert(clean("plain text") == "plain text")
  }

  test("F5/F6/F7: non-alpha stripped, whitespace collapsed, lowercased") {
    assert(clean("Ab1c,2.3  X\tY") == "abc x y")
  }

  test("composed pipeline is idempotent on its own output") {
    val once = clean("MiXeD 123 @u http://z.io 😀ok done")
    assert(clean(once) == once)
  }

  test("empty and whitespace-only input") {
    assert(clean("") == "")
    assert(clean("   \t ") == "")
  }

  test("native EmojiStripTokens expression is bit-equal to the HOF form") {
    val cases = Seq("", "plain text", "a😀b c", "😀 start", "end 🚀",
      " lead", "trail ", "mid😀dle kept", "🇺🇸 flag token", "zero‍joiner x",
      "tab\tsep", "multi   space", "☀ sun ♥")
    val df = cases.toDF("text")
    val out = df.select(
      Cleaning.removeEmojiTokens(col("text")).as("native"),
      Cleaning.removeEmojiTokensHof(col("text")).as("hof")).collect()
    out.zip(cases).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1), s"mismatch for input '$in'")
    }
  }

  test("native expressions are callable from SQL after registration") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT emoji_strip_tokens('a\uD83D\uDE00b keep') AS t,
        |  qdot(array(2L, 3L), array(5L, 7L)) AS d,
        |  quantize_vec(array(CAST(0.5 AS FLOAT), CAST(-1.25 AS FLOAT))) AS q
        |""".stripMargin).collect().head
    assert(r.getString(0) == "keep")
    assert(r.getLong(1) == 31L)
    assert(r.getSeq[Long](2) == Seq(500000L, -1250000L))
  }
}
