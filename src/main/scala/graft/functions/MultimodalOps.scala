package graft.functions

import graft.Q

object MultimodalOps {
  def qs: Seq[Q] = Seq()
}
