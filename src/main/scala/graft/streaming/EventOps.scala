package graft.streaming

import graft.Q

object EventOps {
  def qs: Seq[Q] = Seq()
}
