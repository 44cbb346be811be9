package graft.lda

import graft.Q

/** LDA pipeline (SURVEY.md §2.9, M1–M5). Filled in this round. */
object LdaQueries {
  val queries: Seq[Q] = Seq.empty
}
