package graft.multimodal

import graft.Q

/** Multimodal (binary-column) plumbing (north star). Filled in this round. */
object BinaryOps {
  val queries: Seq[Q] = Seq.empty
}
