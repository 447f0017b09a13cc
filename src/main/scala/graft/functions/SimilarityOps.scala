package graft.functions

import graft.Q

object SimilarityOps {
  def qs: Seq[Q] = Seq()
}
