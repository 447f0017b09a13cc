package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Keyword retrieval and corpus-statistics operators for training-data
  * pipelines: BM25 ranked retrieval and unigram-frequency quality
  * signals (the CCNet-style "score each document by how typical its
  * vocabulary is" gate, in exact-arithmetic form).
  *
  * Scale shape shared by both: the corpus is scanned narrowly (split +
  * explode, codegen'd, no UDF) and never shuffled at document
  * granularity; the only exchanges are token/term-keyed partial
  * aggregations and the per-document re-aggregation. Query terms and
  * corpus-level statistics (document count, average length, vocabulary
  * counts) are tiny by construction and broadcast.
  */
object RetrievalOps {

  /** BM25 parameters (Robertson-Sparck Jones defaults). */
  private val K1 = 1.2
  private val B  = 0.75

  /** BM25 top-`k` documents per query. `docs` needs (doc_id, text);
    * `queries` is the tiny (qid, term) relation (broadcast). See the
    * q101 docstring for the plan shape and determinism contract.
    */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    // stats pass: a two-scalar aggregate straight off the RAW scan — it
    // must not pay the Spread exchange the tf pass wants (each pass is
    // its own job, so a shared Spread input would execute the
    // repartition twice for no benefit to this reduce-only plan)
    val stats = docs.select(split(col("text"), " ").as("w")).agg(
      count(lit(1)).as("n_docs"),
      (sum(size(col("w"))).cast("double") / count(lit(1))).as("avgdl"))
    val toks = graft.operators.Spread.byKey(docs, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val tf = toks
      .select(col("doc_id"), size(col("w")).as("dl"),
        explode(col("w")).as("term"))
      .join(broadcast(queries.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"),
        round(log(lit(1) + (col("n_docs") - col("df") + 0.5)
          / (col("df") + 0.5)), 6).as("idf"))
    val scored = tf
      .join(broadcast(queries), Seq("term"))
      .join(broadcast(idf), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("term_score",
        round(col("idf") * col("tf") * (K1 + 1)
          / (col("tf") + lit(K1) * (lit(1 - B)
            + lit(B) * col("dl") / col("avgdl"))), 6)
          .cast("decimal(28,12)"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("term_score")).as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("s").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("doc_id"),
        round(col("s").cast("double"), 6).as("score"), col("rk"))
  }

  /** Per-doc token/common-hit counts of `toks` (doc_id, tok) against the
    * corpus vocabulary derived from `vocabToks` (tok): output
    * (doc_id, n_tokens, freq_sum, common_hits) where "common" means the
    * top-`topV` vocabulary (ties broken by token). The vocabulary count
    * is a token-keyed partial agg; the top-V set always broadcasts.
    * The full `counts` relation is deliberately UNhinted: a raw web-text
    * vocabulary is unbounded (billions of distinct tokens at 100 TB), so
    * the planner must stay free to pick a token-keyed shuffle join when
    * the size stats say broadcast won't fit — a forced hint would OOM
    * instead of degrading (PlanAuditSpec pins both plan shapes).
    * Measured (Microbench `q102`, sf1, 2026-08-13): the shuffle form
    * costs the same wall time (1.13 s vs 1.15 s) but moves 3.1M shuffle
    * rows where broadcast moves 50k — broadcast is the right choice
    * while it fits, and the degrade path is priced, not hypothetical.
    * Shared by [[unigramQuality]] and CurationOps q116 so the gate's
    * tie-break/null handling has exactly one definition.
    */
  def commonTokenScores(toks: org.apache.spark.sql.DataFrame,
      vocabToks: org.apache.spark.sql.DataFrame, topV: Int)
      : org.apache.spark.sql.DataFrame = {
    val counts = vocabToks.groupBy("tok").agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("tok")).limit(topV)
      .select(col("tok"), lit(1).as("is_common"))
    toks.join(counts, Seq("tok"))
      .join(broadcast(top), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("c")).as("freq_sum"),
        sum(coalesce(col("is_common"), lit(0))).as("common_hits"))
  }

  /** Per-document unigram-frequency quality signals over (doc_id, text):
    * mean corpus frequency of the document's tokens and the fraction of
    * tokens in the corpus top-`topV` vocabulary. Exact integer-sum
    * ratios — see the q102 docstring.
    */
  def unigramQuality(docs: org.apache.spark.sql.DataFrame, topV: Int = 10)
      : org.apache.spark.sql.DataFrame = {
    // vocabulary pass off the RAW scan (reduce-only — the Spread
    // exchange would re-execute per job for no benefit); scoring pass
    // off the Spread'd scan (wide per-row work)
    val vocab = docs.select(explode(split(col("text"), " ")).as("tok"))
    val toks = graft.operators.Spread.byKey(docs, col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    commonTokenScores(toks, vocab, topV)
      .select(col("doc_id"), col("n_tokens"),
        round(col("freq_sum").cast("double") / col("n_tokens"), 6)
          .as("mean_tok_freq"),
        round(col("common_hits").cast("double") / col("n_tokens"), 6)
          .as("common_ratio"))
  }

  def qs: Seq[Q] = Seq(

    // ---- BM25 ranked keyword retrieval, top-5 per query ----
    // Two corpus passes: (1) a global (n_docs, avgdl) aggregate —
    // integer sum / count, so the average is partial-order-independent;
    // (2) a term-filtered tf pass: explode tokens, semi-join against the
    // BROADCAST query-term set (non-matching tokens die in the map
    // stage), then partial-agg (doc, term) counts. idf derives from the
    // tf relation itself (df = rows per term), so no third pass. At
    // 100 TB the filtered explode is the only big stage and it
    // parallelizes by split; everything joined to it (terms, idf,
    // stats) is broadcast. Determinism: per-term scores are rounded to
    // 6 decimals then summed as DECIMAL(28,12), so the (qid, doc) total
    // is independent of Spark's partial-aggregation order; ties (e.g.
    // planted duplicate documents with identical text) break by doc_id.
    Q("q101_bm25_topk",
      (s, d) => {
        import s.implicits._
        val queries = Seq(
          (1, "dup"), (1, "merge"),
          (2, "vector"), (2, "stream"),
          (3, "spark"), (3, "window"), (3, "join"))
          .toDF("qid", "term")
        bm25TopK(Tables.documents(s, d), queries, 5)
          .orderBy("qid", "rk")
      },
      Some("""WITH q(qid, term) AS (VALUES (1,'dup'),(1,'merge'),
             |    (2,'vector'),(2,'stream'),(3,'spark'),(3,'window'),(3,'join')),
             |toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |dl AS (SELECT doc_id, len(w) AS dl FROM toks),
             |stats AS (SELECT count(*) AS n_docs,
             |    CAST(SUM(dl) AS DOUBLE)/count(*) AS avgdl FROM dl),
             |tf AS (SELECT doc_id, tok AS term, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
             |  WHERE tok IN (SELECT term FROM q) GROUP BY 1, 2),
             |idf AS (SELECT term,
             |    round(ln(1 + (n_docs - count(*) + 0.5)/(count(*) + 0.5)), 6) AS idf
             |  FROM tf, stats GROUP BY term, n_docs),
             |scored AS (SELECT q.qid, tf.doc_id,
             |    SUM(CAST(round(idf * tf * 2.2
             |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
             |      AS DECIMAL(28,12))) AS s
             |  FROM q JOIN tf USING (term) JOIN idf USING (term)
             |  JOIN dl USING (doc_id), stats
             |  GROUP BY q.qid, tf.doc_id)
             |SELECT qid, doc_id, round(CAST(s AS DOUBLE), 6) AS score,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, doc_id) AS INT) AS rk
             |FROM scored QUALIFY rk <= 5 ORDER BY qid, rk""".stripMargin),
      "pipeline-op: BM25 ranked keyword retrieval (broadcast terms, top-5 per query)"),

    // ---- unigram-frequency quality signals ----
    // The unigram-LM quality gate in exact arithmetic: instead of mean
    // log-probability (whose libm ln() is not bit-pinned across
    // engines), score each document by (a) the mean corpus frequency of
    // its tokens and (b) the fraction of tokens in the top-10
    // vocabulary — both integer-sum ratios, so the result is
    // reproducible on any engine and any partition order. Same
    // monotonic intent as a perplexity gate: low-typicality documents
    // score low on both. Scale: the vocabulary count table is a
    // token-keyed partial agg (map-side combined); scoring re-explodes
    // the corpus and joins the vocabulary — broadcast when it fits
    // (word-level vocabularies do), shuffle-join otherwise; the top-V
    // set is always tiny and broadcast.
    Q("q102_unigram_quality",
      (s, d) => {
        unigramQuality(Tables.documents(s, d))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
             |  FROM documents),
             |counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
             |top10 AS (SELECT tok FROM counts ORDER BY c DESC, tok LIMIT 10),
             |per_doc AS (SELECT doc_id, count(*) AS n_tokens,
             |    SUM(c) AS freq_sum,
             |    count(*) FILTER (WHERE tok IN (SELECT tok FROM top10)) AS common_hits
             |  FROM toks JOIN counts USING (tok) GROUP BY doc_id)
             |SELECT doc_id, n_tokens,
             |  round(CAST(freq_sum AS DOUBLE)/n_tokens, 6) AS mean_tok_freq,
             |  round(CAST(common_hits AS DOUBLE)/n_tokens, 6) AS common_ratio
             |FROM per_doc ORDER BY doc_id""".stripMargin),
      "pipeline-op: unigram-frequency quality signals (exact-arithmetic LM gate)")
  )
}
