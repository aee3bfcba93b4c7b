package graft.operators

import graft.GQuery

object SimilarityQueries {
  val defs: Seq[GQuery] = Seq.empty
}
