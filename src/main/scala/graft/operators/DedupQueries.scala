package graft.operators

import graft.GQuery

object DedupQueries {
  val defs: Seq[GQuery] = Seq.empty
}
