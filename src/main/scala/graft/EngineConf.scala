package graft

/** Session conf values every engine entry point must agree on. Hoisted so
  * the builders (Bench / Microbench / PlanDoc / ScaleUp / Verify / test
  * sessions) and the queries that document them cannot drift apart.
  */
object EngineConf {
  /** q118's recursion guard scales with anchor-rows × depth (the sf10
    * chain is ~11M rows, far past the 1M default). A deliberate 100M:
    * high enough for the decade scale-up, low enough to still catch a
    * runaway recursion long before it exhausts the heap. The LEVEL
    * limit stays at its default 100 — that is the guard that actually
    * detects non-termination.
    */
  val CteRecursionRowLimit: String = "100000000"
}
