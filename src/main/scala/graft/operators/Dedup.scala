package graft.operators

import graft.Q

/** Deduplication operators (north star; SURVEY.md §7.6). Filled in this round. */
object Dedup {
  val queries: Seq[Q] = Seq.empty
}
