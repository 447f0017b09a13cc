package graft

import graft.functions.{GraftFunctions, RewriteTokenCount}
import graft.plans.AsOfJoin
import org.apache.spark.sql.SparkSession

/** One-call library setup on a live session: registers the `token_count`
  * SQL function, the `graft_normalize` SQL UDF, the TokenCount rewrite
  * rule, and the as-of join planner strategy. Idempotent.
  *
  * Sessions built from config can use `.withExtensions(new
  * functions.GraftExtensions)` instead; this entry point covers the common
  * case of a session the caller doesn't construct (notebooks, shells,
  * job servers).
  */
object Graft {
  def init(spark: SparkSession): SparkSession = {
    GraftFunctions.register(spark)
    registerSqlUdfs(spark)
    AsOfJoin.register(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteTokenCount))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteTokenCount
    spark
  }

  /** `graft_normalize(s)`: [[functions.TextOps.normalizeText]] exposed to
    * SQL text as a Spark 4 SQL-defined function — the body INLINES into
    * the plan as ordinary expressions (no ScalaUDF/eval node, codegen
    * intact), so SQL users get the exact Column-API semantics at the
    * exact Column-API cost.
    */
  def registerSqlUdfs(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("graft_normalize")) spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_normalize(s STRING)
         |RETURNS STRING
         |RETURN trim(regexp_replace(
         |  translate(lower(s), '${functions.TextOps.foldFrom}',
         |    '${functions.TextOps.foldTo}'),
         |  '${functions.TextOps.normPattern}', ' '))""".stripMargin)
}
