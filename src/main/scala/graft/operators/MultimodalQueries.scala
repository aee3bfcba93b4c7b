package graft.operators

import graft.GQuery

object MultimodalQueries {
  val defs: Seq[GQuery] = Seq.empty
}
