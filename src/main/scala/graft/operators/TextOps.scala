package graft.operators

import graft.Q

/** Text cleaning + analysis surface (SURVEY.md §2.3). Filled in this round. */
object TextOps {
  val queries: Seq[Q] = Seq.empty
}
