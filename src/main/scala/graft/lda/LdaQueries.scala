package graft.lda

import graft.Q

/** LDA pipeline queries (SURVEY.md §2.9, M1–M5). Model-fitted output is
  * seeded but not SQL-expressible, so these are rows-only entries (no DuckDB
  * oracle); statistical invariants are covered by the scalatest suite.
  * The deterministic preprocessing stages (tokenize → vocab → doc-term) are
  * oracle-checked separately as text_* queries (TextOps).
  */
object LdaQueries {
  val queries: Seq[Q] = Seq(
    // M3–M5: fit + top-20 words per topic — the reference's output contract
    // (LDATopicModelingWithGibbs.py:196-203).
    Q("lda_topics",
      (s, dir) => LdaPipeline.topicReport(s, dir,
        vocabSize = 1000, numTopics = 5, maxIter = 10),
      None,
      headline = true),

    // M2/θ: per-doc dominant topic, state kept distributed (the reference
    // collects θ driver-side at py:155).
    Q("lda_doc_topics",
      (s, dir) => LdaPipeline.docTopics(s, dir,
        vocabSize = 1000, numTopics = 5, maxIter = 5),
      None),

    // §7.4 stretch: ALGORITHM-level parity — distributed collapsed Gibbs
    // (AD-LDA), the reference's actual sampler without its driver-side
    // collect. Seeded and deterministic under any partitioning.
    Q("gibbs_topics",
      (s, dir) => GibbsLda.topicReport(s, dir,
        vocabSize = 1000, numTopics = 5, maxIter = 5),
      None)
  )
}
