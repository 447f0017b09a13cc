package graft.functions

import graft.Q

object DedupOps {
  def qs: Seq[Q] = Seq()
}
