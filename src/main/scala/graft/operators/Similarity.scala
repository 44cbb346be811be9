package graft.operators

import graft.Q

/** Similarity / ANN search over embeddings (north star). Filled in this round. */
object Similarity {
  val queries: Seq[Q] = Seq.empty
}
