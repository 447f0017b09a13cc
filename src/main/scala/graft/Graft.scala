package graft

import graft.functions.{GraftFunctions, RewriteTokenCount}
import graft.plans.AsOfJoin
import org.apache.spark.sql.SparkSession

/** One-call library setup on a live session: registers the `token_count`
  * SQL function, the TokenCount rewrite rule, and the as-of join planner
  * strategy. Idempotent.
  *
  * Sessions built from config can use `.withExtensions(new
  * functions.GraftExtensions)` instead; this entry point covers the common
  * case of a session the caller doesn't construct (notebooks, shells,
  * job servers).
  */
object Graft {
  def init(spark: SparkSession): SparkSession = {
    GraftFunctions.register(spark)
    AsOfJoin.register(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteTokenCount))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteTokenCount
    spark
  }
}
