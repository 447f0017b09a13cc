package graft.functions

import graft.Q

object TextOps {
  def qs: Seq[Q] = Seq()
}
