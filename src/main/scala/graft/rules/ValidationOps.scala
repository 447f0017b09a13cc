package graft.rules

import graft.Q

object ValidationOps {
  def qs: Seq[Q] = Seq()
}
