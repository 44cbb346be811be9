package graft.streaming

import graft.Q

/** Windowed / streaming event queries (SURVEY.md S4, §2.10). Filled in this round. */
object EventStreams {
  val queries: Seq[Q] = Seq.empty
}
