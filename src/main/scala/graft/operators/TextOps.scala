package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.sources.Tables
import graft.functions.Cleaning

/** The text-processing surface over the `documents` fixture: the reference's
  * preprocessing DAG (clean → tokenize → stopword-filter → word count → top-V
  * vocabulary → doc-term encoding, /root/reference/src/LDATopicModelingWithGibbs.py:28-90
  * and ExtractTwitterData.py:122-164) plus the LLM-pipeline text-analysis
  * operators (quality scoring, language ID, token counting, fingerprinting).
  *
  * Every query is declarative DataFrame API (no UDFs — regex/array built-ins
  * are codegen'd) with a DuckDB oracle. Cross-engine determinism rules:
  *  - ratios are emitted as basis-point integers via floor-division (exact on
  *    both engines; double division of small ints never lands within 1 ulp of
  *    an integer, so floor() agrees with DuckDB's integer //)
  *  - fingerprints use md5 (bit-identical in Spark and DuckDB)
  *  - the vocabulary tiebreak is (count DESC, word ASC) — deterministic,
  *    unlike the reference's arbitrary-tie top() (SURVEY §7.5.1)
  *
  * Scale posture: tokenize/clean are narrow per-row projections fused into
  * the scan; word count is a partial+final hash aggregate; the vocab join
  * broadcasts only the bounded top-V side; no driver-side state anywhere.
  */
object TextOps {

  /** Vendored stopword list used by the oracle-checked queries (the LDA
    * pipeline uses Spark's full english list; this bounded list is mirrored
    * verbatim into the DuckDB oracles). Reference analogue: the custom
    * stopword set at LDATopicModelingWithGibbs.py:36-41. */
  val StopWords: Seq[String] =
    Seq("a", "the", "and", "of", "to", "in", "is", "it", "on", "for")

  private val swSqlList = StopWords.map(w => s"'$w'").mkString(", ")
  private val swArray: Column = array(StopWords.map(lit): _*)

  /** Clean + whitespace-tokenize + stopword/empty filter, as one Column over
    * `text` (P1/P2). */
  private def tokensCol: Column =
    filter(split(Cleaning.cleanText(col("text")), " "),
      t => !array_contains(swArray, t) && t =!= "")

  /** documents scan fanned out to every core (guide §2.2: the single-row-
    * group fixture plans as ONE scan task, serializing the regex chain). */
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.documents(s, dir))

  private def docsWithTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), tokensCol.as("w"))

  /** doc_id, word — the exploded token stream (E2). */
  private def tokenStream(s: SparkSession, dir: String): DataFrame =
    docsWithTokens(s, dir).select(col("doc_id"), explode(col("w")).as("word"))

  /** Shared oracle mirror of the cleaning chain (single source of truth in
    * Cleaning.CleanTextSql so the text_* and dedup_* oracles cannot drift). */
  private val cleanSql: String = Cleaning.CleanTextSql

  private val tokSql: String =
    s"""WITH cleaned AS (
       |  SELECT doc_id, $cleanSql AS clean FROM documents),
       |tok AS (
       |  SELECT doc_id, word
       |  FROM cleaned, unnest(string_split(clean, ' ')) AS u(word)
       |  WHERE word <> '' AND word NOT IN ($swSqlList))""".stripMargin

  private val vocabSqlCte: String = // requires tokSql's `tok`
    """wc AS (SELECT word, count(*) AS cnt FROM tok GROUP BY word),
      |vocab AS (
      |  SELECT word, cnt,
      |    row_number() OVER (ORDER BY cnt DESC, word ASC) - 1 AS pos
      |  FROM wc ORDER BY cnt DESC, word ASC LIMIT 100)""".stripMargin

  /** Top-V vocabulary with deterministic (count DESC, word ASC) tiebreak
    * (T1 + SURVEY §7.5.1); pos 0..V-1. V=100 bounds the result, so the
    * single-partition row_number window is driver-cheap at any sf. */
  private def vocabFrom(tokens: DataFrame, v: Int = 100): DataFrame = {
    val wc = tokens.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(desc("cnt"), asc("word"))
    wc.orderBy(desc("cnt"), asc("word")).limit(v)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  private def vocab(s: SparkSession, dir: String, v: Int = 100): DataFrame =
    vocabFrom(tokenStream(s, dir), v)

  val queries: Seq[Q] = Seq(
    // ---- F1–F7: the composed cleaning chain (ExtractTwitterData.py:158-164).
    Q(
      "text_clean",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), Cleaning.cleanText(col("text")).as("clean"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, $cleanSql AS clean
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- P1/P2/E2: tokenize + stopword filter + word-with-doc explode.
    Q(
      "text_tokens",
      (s, dir) => tokenStream(s, dir).orderBy(col("doc_id"), col("word")),
      Some(s"""$tokSql
              |SELECT doc_id, word FROM tok ORDER BY doc_id, word""".stripMargin)),

    // ---- E1/A1: word count — partial+final hash agg, the reference's
    // reduceByKey(add) (py:43-48).
    Q(
      "text_wordcount",
      (s, dir) => tokenStream(s, dir)
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("word")),
      Some(s"""$tokSql
              |SELECT word, count(*) AS cnt FROM tok
              |GROUP BY word ORDER BY cnt DESC, word ASC""".stripMargin),
      headline = true),

    // ---- T1: top-V vocabulary with positions (py:50-68).
    Q(
      "text_vocab",
      (s, dir) => vocab(s, dir).orderBy(col("pos")),
      Some(s"""$tokSql, $vocabSqlCte
              |SELECT word, cnt, pos FROM vocab ORDER BY pos""".stripMargin)),

    // ---- J1/A2: doc-term encoding — tokens ⋈ broadcast(vocab) → per-doc
    // sorted position list (py:70-90). Docs with zero in-vocab words drop out
    // (inner-join corpus shrink, SURVEY §7.5.2).
    Q(
      "text_doc_term",
      (s, dir) => {
        // The clean→tokenize→explode chain feeds BOTH the vocab aggregate and
        // the join probe side; persist it so the 8-regex cleaning chain runs
        // once per doc, not twice (guide §2.4 — the vocab's broadcast job
        // materializes the cache, the main job reads it back).
        val docsTok = docsWithTokens(s, dir).persist()
        val toks = docsTok.select(col("doc_id"), explode(col("w")).as("word"))
        toks
          .join(broadcast(vocabFrom(toks).select(col("word"), col("pos"))), "word")
          .groupBy(col("doc_id"))
          .agg(array_join(sort_array(collect_list(col("pos"))), ",").as("positions"),
            count(lit(1)).as("n_terms"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$tokSql, $vocabSqlCte
              |SELECT doc_id,
              |  array_to_string(list(pos ORDER BY pos), ',') AS positions,
              |  count(*) AS n_terms
              |FROM tok JOIN vocab USING (word)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      headline = true),

    // ---- J1 variant: per-doc in-vocab vs out-of-vocab accounting — makes
    // the corpus-shrink semantics of the inner join observable.
    Q(
      "text_vocab_coverage",
      (s, dir) => {
        // Same shared-token-stream persist as text_doc_term (guide §2.4).
        val docsTok = docsWithTokens(s, dir).persist()
        val toks = docsTok.select(col("doc_id"), explode(col("w")).as("word"))
        val v = vocabFrom(toks).select(col("word"), col("pos"))
        toks
          .join(broadcast(v), Seq("word"), "left_outer")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            count(col("pos")).as("n_invocab"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$tokSql, $vocabSqlCte
              |SELECT doc_id, count(*) AS n_tokens, count(pos) AS n_invocab
              |FROM tok LEFT JOIN vocab USING (word)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Quality scoring: per-doc token stats with ratios as exact
    // basis-point integers (floor-div — see object doc). Computed on the
    // exploded token stream: the cleaning chain runs once per doc and the
    // aggregations reference only cheap attributes (multi-reference array
    // lambdas would re-evaluate the chain per element — see ShingleSet).
    Q(
      "text_quality",
      (s, dir) => {
        val rawTok = docs(s, dir).select(
          col("doc_id"), col("n_chars"),
          explode(split(Cleaning.cleanText(col("text")), " ")).as("t"))
        val nAll = sum(when(col("t") =!= "", 1L).otherwise(0L))
        val nStop = sum(when(array_contains(swArray, col("t")), 1L).otherwise(0L))
        val totLen = sum(length(col("t")).cast("long"))
        rawTok.groupBy(col("doc_id"), col("n_chars"))
          .agg(nAll.as("n_tokens"), nStop.as("n_stop"), totLen.as("tot_len"))
          .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("n_stop"),
            when(col("n_tokens") > 0,
              floor(lit(10000) * col("n_stop") / col("n_tokens"))).otherwise(0L)
              .cast("long").as("stop_bp"),
            when(col("n_tokens") > 0,
              floor(lit(100) * col("tot_len") / col("n_tokens"))).otherwise(0L)
              .cast("long").as("avg_len_c"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH cleaned AS (
              |  SELECT doc_id, n_chars, $cleanSql AS clean FROM documents),
              |stats AS (
              |  SELECT doc_id, n_chars,
              |    len(list_filter(string_split(clean, ' '), t -> t <> '')) AS n_tokens,
              |    len(list_filter(string_split(clean, ' '),
              |        t -> t IN ($swSqlList))) AS n_stop,
              |    list_sum(list_transform(list_filter(string_split(clean, ' '),
              |        t -> t <> ''), t -> len(t))) AS tot_len
              |  FROM cleaned)
              |SELECT doc_id, n_chars, CAST(n_tokens AS BIGINT) AS n_tokens,
              |  CAST(n_stop AS BIGINT) AS n_stop,
              |  CAST(CASE WHEN n_tokens > 0 THEN (10000 * n_stop) // n_tokens
              |       ELSE 0 END AS BIGINT) AS stop_bp,
              |  CAST(CASE WHEN n_tokens > 0 THEN (100 * tot_len) // n_tokens
              |       ELSE 0 END AS BIGINT) AS avg_len_c
              |FROM stats ORDER BY doc_id""".stripMargin)),

    // ---- Language ID: marker-word heuristic (english function-word density
    // in basis points; the fixture corpus is english-ish for every `lang`
    // label, so the interesting output is the score, not label recovery).
    Q(
      "text_langid",
      (s, dir) => {
        val rawTok = docs(s, dir).select(
          col("doc_id"), col("lang"),
          explode(split(Cleaning.cleanText(col("text")), " ")).as("t"))
        val agg = rawTok.groupBy(col("doc_id"), col("lang"))
          .agg(sum(when(col("t") =!= "", 1L).otherwise(0L)).as("n_all"),
            sum(when(array_contains(swArray, col("t")), 1L).otherwise(0L)).as("n_en"))
        val bp = when(col("n_all") > 0,
          floor(lit(10000) * col("n_en") / col("n_all"))).otherwise(0L).cast("long")
        agg.select(col("doc_id"), col("lang").as("lang_label"),
            bp.as("en_marker_bp"),
            when(bp >= 400, lit("en")).otherwise(lit("und")).as("lang_pred"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH cleaned AS (
              |  SELECT doc_id, lang, $cleanSql AS clean FROM documents),
              |stats AS (
              |  SELECT doc_id, lang,
              |    len(list_filter(string_split(clean, ' '), t -> t <> '')) AS n_all,
              |    len(list_filter(string_split(clean, ' '),
              |        t -> t IN ($swSqlList))) AS n_en
              |  FROM cleaned)
              |SELECT doc_id, lang AS lang_label,
              |  CAST(CASE WHEN n_all > 0 THEN (10000 * n_en) // n_all ELSE 0 END
              |    AS BIGINT) AS en_marker_bp,
              |  CASE WHEN n_all > 0 AND (10000 * n_en) // n_all >= 400
              |    THEN 'en' ELSE 'und' END AS lang_pred
              |FROM stats ORDER BY doc_id""".stripMargin)),

    // ---- Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (letter runs / digit runs / single other chars).
    Q(
      "text_token_count",
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        size(filter(split(col("text"), "\\s+"), t => t =!= "")).cast("long")
          .as("n_ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
          .cast("long").as("n_bpe_tokens"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
             |    t -> t <> '')) AS BIGINT) AS n_ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
             |    AS BIGINT) AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- TF-IDF core statistics: document frequency + collection frequency
    // per word, all exact integers (the relational heart of TF-IDF; the
    // IDF log-weighting runs Spark-side — ln is not cross-engine
    // bit-stable, so the oracle checks the exact counts).
    Q(
      "text_doc_freq",
      (s, dir) => tokenStream(s, dir)
        .groupBy(col("word"))
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("cf"))
        .orderBy(desc("df"), asc("word")),
      Some(s"""$tokSql
              |SELECT word, count(DISTINCT doc_id) AS df, count(*) AS cf
              |FROM tok GROUP BY word
              |ORDER BY df DESC, word ASC""".stripMargin)),

    // ---- E3: position-aware explode (posexplode — the topic-position zip
    // of LDATopicModelingWithGibbs.py:136).
    Q(
      "text_token_positions",
      (s, dir) => docsWithTokens(s, dir)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(col("w")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("word"))
        .orderBy(col("doc_id"), col("pos")),
      Some(s"""WITH cleaned AS (
              |  SELECT doc_id, $cleanSql AS clean FROM documents WHERE doc_id < 50),
              |d AS (SELECT doc_id,
              |  list_filter(string_split(clean, ' '),
              |    t -> t <> '' AND t NOT IN ($swSqlList)) AS w
              |  FROM cleaned)
              |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS word
              |FROM d, unnest(generate_series(1, len(w))) AS g(i)
              |ORDER BY doc_id, pos""".stripMargin)),

    // ---- A6: per-doc in-array histogram via higher-order functions (the
    // per-doc topic-histogram shape, py:122) — token-length counts 1..10.
    Q(
      "text_len_hist",
      (s, dir) => {
        val hist = tokenStream(s, dir).groupBy(col("doc_id"))
          .agg(
            sum(when(length(col("word")) === 1, 1L).otherwise(0L)).as("h1"),
            (2 to 10).map(k =>
              sum(when(length(col("word")) === k, 1L).otherwise(0L)).as(s"h$k")): _*)
        Tables.documents(s, dir).select(col("doc_id"))
          .join(hist, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            array_join(array((1 to 10).map(k => coalesce(col(s"h$k"), lit(0L))): _*), ",")
              .as("len_hist"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$tokSql, d AS (
              |  SELECT c.doc_id,
              |    coalesce(list(tok.word), []) AS w
              |  FROM cleaned c LEFT JOIN tok ON c.doc_id = tok.doc_id
              |  GROUP BY c.doc_id)
              |SELECT doc_id,
              |  array_to_string(list_transform(generate_series(1, 10),
              |    k -> len(list_filter(w, t -> len(t) = k))), ',') AS len_hist
              |FROM d ORDER BY doc_id""".stripMargin)),

    // ---- A5 + §2.10 UDAF: global elementwise vector reduce of the per-doc
    // histograms via the typed ArraySumAgg Aggregator (the reference's
    // reduce(np.add) n_z accumulation, py:158).
    Q(
      "text_len_hist_global",
      (s, dir) => {
        val a = udaf(graft.functions.ArraySumAgg)
        val hist = tokenStream(s, dir).groupBy(col("doc_id"))
          .agg(
            sum(when(length(col("word")) === 1, 1L).otherwise(0L)).as("h1"),
            (2 to 10).map(k =>
              sum(when(length(col("word")) === k, 1L).otherwise(0L)).as(s"h$k")): _*)
          .select(array((1 to 10).map(k => col(s"h$k")): _*).as("hist"))
        hist.agg(a(col("hist")).as("h"))
          .select(array_join(col("h"), ",").as("global_len_hist"))
      },
      Some(s"""$tokSql, hists AS (
              |  SELECT doc_id, len(word) AS l FROM tok),
              |sums AS (
              |  SELECT k, count(*) FILTER (WHERE l = k) AS s
              |  FROM hists, unnest(generate_series(1, 10)) AS g(k)
              |  GROUP BY k)
              |SELECT array_to_string(list(s ORDER BY k), ',') AS global_len_hist
              |FROM sums""".stripMargin)),

    // ---- The composed curation pipeline — what a training-data team runs:
    // clean → token/quality stats → quality gate → exact-dedup keep-first →
    // curated corpus. One declarative plan: the clean chain runs once in the
    // scan projection, stats aggregate off the exploded stream, the dedup
    // canonical is a window over the fingerprint. Every stage is an operator
    // proven above; this query proves they compose.
    Q(
      "pipeline_curate",
      (s, dir) => {
        val rawTok = docs(s, dir).select(
          col("doc_id"), Cleaning.cleanText(col("text")).as("clean"))
          .select(col("doc_id"), col("clean"),
            explode(split(col("clean"), " ")).as("t"))
        // Group on doc_id alone (it uniquely determines `clean`): the
        // pre-r21 key (doc_id, clean) made the partial hash-aggregate hash
        // and compare the FULL cleaned text once per token row, and shipped
        // the text as part of the shuffle key. first(clean) is deterministic
        // here — every row in a group carries the same value (guide §2.4:
        // shuffle fewer bytes, cheaper group keys).
        val stats = rawTok.groupBy(col("doc_id"))
          .agg(first(col("clean")).as("clean"),
            sum(when(col("t") =!= "", 1L).otherwise(0L)).as("n_tokens"),
            sum(when(array_contains(swArray, col("t")), 1L).otherwise(0L)).as("n_stop"))
          .withColumn("stop_bp",
            when(col("n_tokens") > 0,
              floor(lit(10000) * col("n_stop") / col("n_tokens"))).otherwise(0L)
              .cast("long"))
          .withColumn("doc_md5", md5(col("clean").cast("binary")))
        val w = Window.partitionBy(col("doc_md5"))
        stats
          .withColumn("canonical_id", min(col("doc_id")).over(w))
          .filter(col("doc_id") === col("canonical_id") &&
            col("n_tokens") >= 20 && col("stop_bp") <= 2000)
          .select(col("doc_id"), col("n_tokens"), col("stop_bp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH cleaned AS (
              |  SELECT doc_id, $cleanSql AS clean FROM documents),
              |stats AS (
              |  SELECT doc_id, clean,
              |    CAST(len(list_filter(string_split(clean, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
              |    CAST(len(list_filter(string_split(clean, ' '),
              |      t -> t IN ($swSqlList))) AS BIGINT) AS n_stop
              |  FROM cleaned),
              |scored AS (
              |  SELECT doc_id, md5(clean) AS doc_md5, n_tokens,
              |    CAST(CASE WHEN n_tokens > 0 THEN (10000 * n_stop) // n_tokens
              |      ELSE 0 END AS BIGINT) AS stop_bp
              |  FROM stats),
              |canon AS (
              |  SELECT doc_id, n_tokens, stop_bp,
              |    min(doc_id) OVER (PARTITION BY doc_md5) AS canonical_id
              |  FROM scored)
              |SELECT doc_id, n_tokens, stop_bp
              |FROM canon
              |WHERE doc_id = canonical_id AND n_tokens >= 20 AND stop_bp <= 2000
              |ORDER BY doc_id""".stripMargin),
      headline = true),

    // ---- Fingerprinting: whole-doc md5 + MinHash-1 over word 3-gram
    // shingles (md5 is bit-identical across engines; min() over shingle
    // hashes is the k=1 MinHash signature — the scale path to MinHashLSH).
    Q(
      "text_fingerprint",
      (s, dir) => {
        // Persist the cleaned text: both `w` and `doc_md5` reference it, and
        // CollapseProject would inline the 8-regex chain into each use,
        // running it 2× per doc (guide §2.4 / §5).
        val cleaned = docs(s, dir)
          .select(col("doc_id"), Cleaning.cleanText(col("text")).as("clean"))
          .persist()
        val w = filter(split(col("clean"), " "), t => t =!= "")
        cleaned
          .select(col("doc_id"), w.as("w"),
            md5(col("clean").cast("binary")).as("doc_md5"))
          // ShingleSet is one native expression referencing w once — the
          // transform-over-sequence form re-evaluates w's defining chain
          // per element after projection collapse (see ShingleSet docs).
          .select(col("doc_id"), col("doc_md5"),
            when(size(col("w")) >= 3,
              array_min(transform(graft.functions.ShingleSet(col("w")),
                g => md5(g.cast("binary")))))
              .otherwise(lit(null)).as("minhash1"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH cleaned AS (
              |  SELECT doc_id, $cleanSql AS clean FROM documents),
              |words AS (
              |  SELECT doc_id, md5(clean) AS doc_md5,
              |    list_filter(string_split(clean, ' '), t -> t <> '') AS w
              |  FROM cleaned),
              |shingles AS (
              |  SELECT doc_id, doc_md5,
              |    md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh
              |  FROM words, unnest(generate_series(1, len(w) - 2)) AS g(i)
              |  WHERE len(w) >= 3)
              |SELECT c.doc_id, c2.doc_md5, s.mh AS minhash1
              |FROM cleaned c
              |LEFT JOIN (SELECT doc_id, min(sh) AS mh FROM shingles GROUP BY doc_id) s
              |  ON c.doc_id = s.doc_id
              |LEFT JOIN (SELECT DISTINCT doc_id, doc_md5 FROM words) c2
              |  ON c.doc_id = c2.doc_id
              |ORDER BY c.doc_id""".stripMargin))
  )
}
