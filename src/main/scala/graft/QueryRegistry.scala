package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demonstration.
  *
  * @param name   stable key (drives CORRECTNESS_r{N}.json entries)
  * @param fn     Spark implementation over the sfDir parquet tables
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables;
  *               None => the driver records a weaker rows-only check
  *               (used for ops whose semantics aren't SQL-expressible,
  *               e.g. hash-seeded LSH)
  * @param doc    which SURVEY.md §2 (or pipeline-op) item this covers
  *
  * Determinism contract: every query ends in a total ORDER BY replicated
  * verbatim in the oracle SQL, and every floating aggregate goes through
  * DECIMAL so the value is independent of partial-aggregation order.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)

/** Central registry — SparkEntry derives its maps from here. */
object QueryRegistry {
  def all: Seq[Q] =
    graft.operators.RelationalOps.qs ++
      graft.operators.GraphOps.qs ++
      graft.operators.LayoutOps.qs ++
      graft.rules.ValidationOps.qs ++
      graft.functions.TextOps.qs ++
      graft.functions.DedupOps.qs ++
      graft.functions.SimilarityOps.qs ++
      graft.streaming.EventOps.qs ++
      graft.functions.MultimodalOps.qs ++
      graft.functions.CountMinOps.qs ++
      graft.functions.CurationOps.qs ++
      graft.functions.RetrievalOps.qs ++
      graft.functions.ProfileOps.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
