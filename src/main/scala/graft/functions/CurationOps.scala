package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators beyond the reference's surface:
  * eval-set decontamination, deterministic hash sampling, and sequence
  * packing — the steps between "deduplicated corpus" and "training run"
  * in an LLM data pipeline.
  *
  * All three are built from codegen'd built-ins only (split/slice/
  * transform/window), with the 100 TB shape noted per operator.
  */
object CurationOps {

  /** DSIR — Data Selection with Importance Resampling (Xie et al.
    * 2023, arXiv:2302.03169) over hashed unigram features: per-bucket
    * log-ratio of add-one-smoothed target vs raw distributions
    * (256 buckets = first two hex chars of md5(token)), per-doc weight
    * = sum of bucket counts times bucket log-ratios, top-`k` by weight
    * (doc_id tie-break). FP discipline per q101: ratios rounded to 6
    * decimals, contributions summed as exact DECIMAL(28,12), ranking
    * on the decimal. One explode feeds two partial-agg shuffles;
    * weights broadcast back; top-k is TakeOrdered + a k-row rank
    * window — no all-pairs, no data-sized global window.
    */
  def dsirTopK(docs: DataFrame, isTarget: Column, k: Int): DataFrame = {
    val toks = graft.operators.Spread.byKey(docs, col("doc_id"))
      .select(col("doc_id"), isTarget.as("is_tgt"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("b", substring(md5(col("tok")), 1, 2))
    val buckets = toks.groupBy("b").agg(
      count(lit(1)).as("raw_n"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_n"))
    val totals = buckets.agg(sum("raw_n").as("raw_t"),
      sum("tgt_n").as("tgt_t"))
    val weights = buckets.crossJoin(broadcast(totals)).select(col("b"),
      round(log((col("tgt_n") + 1.0) / (col("tgt_t") + 256.0))
        - log((col("raw_n") + 1.0) / (col("raw_t") + 256.0)), 6)
        .as("w"))
    val perDocBucket = toks.groupBy("doc_id", "b")
      .agg(count(lit(1)).as("c"))
    val scored = perDocBucket.join(broadcast(weights), Seq("b"))
      .withColumn("contrib",
        round(col("c") * col("w"), 6).cast("decimal(28,12)"))
      .groupBy("doc_id").agg(sum("contrib").as("s"))
    val top = scored.orderBy(col("s").desc, col("doc_id")).limit(k)
    top.withColumn("rk", row_number().over(
        Window.orderBy(col("s").desc, col("doc_id"))))
      .select(col("doc_id"),
        round(col("s").cast("double"), 6).as("weight"), col("rk"))
      .orderBy("rk")
  }

  /** Whitespace token array. */
  def toks(c: Column): Column = split(c, " ")

  /** Per-document duplicated n-gram span counts over (doc_id, text):
    * how many of the document's word `n`-gram positions are duplicated
    * anywhere in the corpus (including within the same document), plus
    * the distinct offending grams and the duplicated fraction. See the
    * q103 docstring for the plan shape.
    */
  def dupNgramSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    val grams = ngrams(docs.select(col("doc_id"), toks(col("text")).as("w")), n)
      .select(col("doc_id"), md5(col("g")).as("gh"))
    val gcounts = grams.groupBy("gh").agg(count(lit(1)).as("total"))
    val perDoc = grams.join(gcounts, Seq("gh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("total") > 1, lit(1))).as("dup_pos"),
        count_distinct(when(col("total") > 1, col("gh"))).as("dup_grams"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dup_pos"), lit(0L)).as("dup_pos"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        round(when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("dup_pos").cast("double") / col("n_grams")), 6)
          .as("dup_frac"))
  }

  /** One row per word n-gram of `df`'s `w` token-array column:
    * (doc_id, g). A pure narrow map — no shuffle, no UDF; sequence+
    * transform+slice stay inside whole-stage codegen. Documents shorter
    * than `n` produce no rows (sequence() would count DOWNWARD on a
    * negative span, hence the explicit size guard).
    */
  def ngrams(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"), explode(
      when(size(col("w")) >= n,
        transform(sequence(lit(0), size(col("w")) - n),
          i => array_join(slice(col("w"), i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))).as("g"))

  /** Train-vs-eval n-gram decontamination: flag every training document
    * sharing at least one word 5-gram with the eval set, with the number
    * of distinct leaked grams per document.
    *
    * Scale shape: eval sets are tiny by construction (benchmarks, held-out
    * prompts), so their distinct grams BROADCAST; the corpus side is one
    * narrow gram-explode pass joined against that broadcast — the corpus
    * is never shuffled. The only exchange is the per-doc hit aggregation,
    * which partial-aggregates map-side. At 100 TB the corpus scan
    * dominates and parallelizes by split; there is no all-pairs term.
    */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame,
      n: Int = 5): DataFrame = {
    val evalGrams = ngrams(evalDocs, n).select("g").distinct()
    ngrams(corpus, n)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id")
      .agg(count_distinct(col("g")).as("hits"))
  }

  /** Register the bloom build/probe Catalyst expressions as named
    * functions — the exact machinery Spark's own InjectRuntimeFilter
    * uses (mergeable BloomFilterAggregate build, codegen'd
    * BloomFilterMightContain probe), surfaced for explicit use the way
    * `token_count` is. Guarded: idempotent and WARN-free.
    */
  private def registerBloom(s: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = s.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_agg")))
      reg.createOrReplaceTempFunction("graft_bloom_agg", exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "scala_udf")
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_contains")))
      reg.createOrReplaceTempFunction("graft_bloom_contains", exprs =>
        new org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
  }

  /** Bloom-filter n-gram decontamination — the VERIFICATION harness for
    * the membership-structure form of [[decontaminate]] (eval suites
    * too large to broadcast as an exact gram set — the Dolma-scale
    * design). Returns one row per distinct (doc_id, gram) probe with
    * BOTH the bloom verdict and the exact-join verdict, so callers can
    * assert the contract (bloom ⊇ exact: zero false negatives; FP rate
    * under the `numBits` sizing bound) in-band — q145 pins exactly
    * that against the DuckDB exact side. Stated honestly: this
    * harness's per-(doc_id, gram) DISTINCT and its exact-join column
    * both shuffle the corpus grams — that is the price of verifying,
    * not of decontaminating. The production operator is [[bloomProbe]]
    * below, whose corpus side is a genuinely narrow probe.
    */
  def bloomDecontaminate(corpus: DataFrame, evalDocs: DataFrame,
      n: Int = 5, expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    val s = corpus.sparkSession
    registerBloom(s)
    val evalGrams = ngrams(evalDocs, n).select("g").distinct()
    // the build aggregates distributed (map-side partial filters merge)
    // and lands as ONE ~MB binary on the driver — the same sanctioned
    // one-row scalar read a runtime-filter subquery performs — then
    // rides into the probe as a plan literal (might_contain requires a
    // constant/scalar-subquery filter side; a reference object, not
    // inlined codegen text)
    val bloomBytes = Option(evalGrams.agg(call_function("graft_bloom_agg",
        xxhash64(col("g")), lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf"))
    val probe = bloomBytes match {
      case Some(bytes) => call_function("graft_bloom_contains", lit(bytes),
        xxhash64(col("g")))
      case None => lit(false) // empty eval set: nothing can leak
    }
    ngrams(corpus, n).select("doc_id", "g").distinct()
      .join(broadcast(evalGrams.select(col("g"), lit(true).as("ex"))),
        Seq("g"), "left")
      .select(col("doc_id"), col("g"), probe.as("bloom_hit"),
        coalesce(col("ex"), lit(false)).as("exact_hit"))
  }

  /** PRODUCTION bloom decontamination: per-document leaked-gram counts
    * with the plan shape the design point demands — the corpus side is
    * a NARROW gram-explode + codegen'd `might_contain` probe (no
    * distinct, no join, no corpus-gram shuffle; the only exchange is
    * the final tiny doc-level count aggregate), and the bloom BUILD is
    * a SCALAR SUBQUERY over the eval set's distinct gram hashes (a
    * mergeable aggregate: distributed, map-side partials), so
    * constructing this frame launches NO job — the build runs when the
    * query runs, exactly like Spark's own InjectRuntimeFilter blooms.
    * Bloom semantics: zero false negatives (a doc with
    * `leaked_grams = 0` is certainly clean — the decontamination
    * decision); positives are bounded-FP candidates for an exact
    * recheck if the pipeline wants one.
    *
    * Returns `(doc_id, n_grams, leaked_grams)` per corpus document.
    */
  def bloomProbe(corpus: DataFrame, evalDocs: DataFrame, n: Int = 5,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    val s = corpus.sparkSession
    registerBloom(s)
    val view = s"graft_eval_grams_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    ngrams(evalDocs, n).select("g").distinct().createOrReplaceTempView(view)
    // Dataset construction analyzes eagerly, so the scalar subquery
    // resolves the view into the plan right here — drop the view before
    // returning (a long-lived session calling this in a loop would
    // otherwise accumulate catalog entries without bound); the returned
    // frame keeps its resolved subplan and never re-looks the name up
    try {
      val hit = expr(s"graft_bloom_contains((SELECT graft_bloom_agg(" +
        s"xxhash64(g), ${expectedItems}L, ${numBits}L) FROM $view), xxhash64(g))")
      ngrams(corpus, n).select(col("doc_id"), hit.as("hit"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("leaked_grams"))
    } finally s.catalog.dropTempView(view)
  }

  /** Highest multiplicity of any element of a string array, as
    * sort + one linear run-length pass (`aggregate` carrying
    * (prev, current-run, best-run) struct state): O(n log n) per row.
    * The naive per-distinct-gram `filter` count is O(n * distinct) —
    * quadratic on a repetitive 100k-word document, which is exactly the
    * input a repetition gate exists to catch. The `""` sentinel for
    * `prev` is safe: a first element equal to the sentinel still starts
    * its run at 0+1.
    */
  def topRunCount(arr: Column): Column = {
    def runOf(acc: Column, x: Column): Column =
      when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
    aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => struct(x.as("prev"), runOf(acc, x).as("run"),
        greatest(acc.getField("best"), runOf(acc, x)).as("best")),
      acc => greatest(acc.getField("best"), acc.getField("run")))
  }

  /** Deterministic hash bucket 0-99 for a document id: md5 of the salted
    * id, first 8 hex digits as an integer, mod 100. Identical arithmetic
    * is expressible in any engine (the DuckDB oracle casts the same hex
    * substring), so a sample taken today is reproducible anywhere,
    * resumable, and stable under corpus growth — properties a
    * Bernoulli-RNG sample does not have.
    */
  def hashBucket(id: Column): Column =
    conv(substring(md5(concat(lit("doc:"), id)), 1, 8), 16, 10)
      .cast("long") % 100

  /** Content-defined chunk statistics (the FastCDC/Rabin idea on word
    * windows): a chunk boundary falls after word `i` when the md5 of
    * the trailing 3-word window hashes to 0 mod `div` (expected chunk
    * length ≈ `div` words); the document end always closes the last
    * chunk. Unlike fixed-stride chunking (q99), boundaries are a
    * function of CONTENT alone, so an insertion or deletion re-chunks
    * only the region around the edit — the property that keeps
    * chunk-level dedup stable across document revisions. One narrow
    * codegen'd pass (higher-order functions over the token array — no
    * explode, no shuffle, no UDF); md5-derived buckets so any engine
    * can replay the boundaries. Returns per-doc
    * `(doc_id, n_tokens, n_chunks, max_chunk)`.
    */
  /** The chunk boundary positions (1-based, ascending, always ending at
    * the token count) for a token-array column — see
    * [[contentChunkStats]]. Exposed so tests can pin the
    * revision-stability property on the raw boundaries.
    */
  private[graft] def contentChunkBounds(w: Column, div: Int): Column = {
    val n = size(w)
    // candidate cut positions 3..n-1 (a window needs 3 words; position n
    // is always a boundary); the n<4 guard stops sequence() descending
    val cand = filter(
      when(n - 1 >= 3, sequence(lit(3), n - 1))
        .otherwise(array().cast("array<int>")),
      i => conv(substring(md5(array_join(slice(w, i - 2, lit(3)), " ")),
        1, 8), 16, 10).cast("long") % div === 0)
    concat(cand, array(n))
  }

  def contentChunkStats(docs: DataFrame, div: Int = 16): DataFrame = {
    val w = toks(col("text"))
    val bounds = contentChunkBounds(w, div)
    val prevs = concat(array(lit(0)),
      slice(bounds, lit(1), size(bounds) - 1))
    val lens = zip_with(bounds, prevs, (b, p) => b - p)
    docs.select(col("doc_id"), size(w).cast("long").as("n_tokens"),
      size(bounds).cast("long").as("n_chunks"),
      array_max(lens).cast("long").as("max_chunk"))
  }

  def qs: Seq[Q] = Seq(

    // ---- eval-set n-gram decontamination. The synthetic corpus has no
    // natural cross-doc 5-gram overlap, so the eval set is PLANTED from
    // the corpus itself: the first 24 words of every 40th document stand
    // in for a leaked benchmark prompt. Each source document must flag
    // itself (20 grams from a 24-word snippet) plus any true collision —
    // a non-trivial, fully deterministic result. The oracle bounds its
    // gram index at 128 (max document length in the harness data is 100
    // words); the Spark side needs no bound (sequence sizes per row). ----
    Q("q90_decontaminate",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("w"))
        val evalSnips = words.filter(col("doc_id") % 40 === 0)
          .select(col("doc_id"), slice(col("w"), 1, 24).as("w"))
        decontaminate(words, evalSnips).orderBy("doc_id")
      },
      Some("""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents),
             |grams AS (SELECT doc_id, array_to_string(w[i.range:i.range+4], ' ') AS g
             |  FROM words, range(1, 128) i WHERE i.range <= len(w) - 4),
             |eval_snips AS (SELECT doc_id, w[1:24] AS w FROM words
             |  WHERE doc_id % 40 = 0),
             |eval_grams AS (SELECT DISTINCT array_to_string(w[i.range:i.range+4], ' ') AS g
             |  FROM eval_snips, range(1, 128) i WHERE i.range <= len(w) - 4)
             |SELECT doc_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS hits
             |FROM grams JOIN eval_grams USING (g)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "pipeline-op: eval-set n-gram decontamination (broadcast eval grams)"),

    // ---- bloom-filter decontamination: the same leak question answered
    // by a broadcast MEMBERSHIP STRUCTURE instead of a broadcast gram
    // set — the form that survives eval suites with hundreds of millions
    // of grams (a ~1 MB filter vs gigabytes of strings). The oracle
    // can't rebuild Spark's bloom, so the query emits the exact-side
    // numbers (DuckDB-checkable) plus two in-band VERDICTS the oracle
    // pins true: no-false-negatives (bloom ⊇ exact — the bloom
    // guarantee) and FP rate under 5% (sized for far less). Same
    // verdict pattern as the q54/q66/q140 sketches. ----
    Q("q145_bloom_decontaminate",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("w"))
        val evalSnips = words.filter(col("doc_id") % 40 === 0)
          .select(col("doc_id"), slice(col("w"), 1, 24).as("w"))
        bloomDecontaminate(words, evalSnips).agg(
          count(lit(1)).as("n_probes"),
          sum(when(col("exact_hit"), 1L).otherwise(0L)).as("exact_gram_hits"),
          count_distinct(when(col("exact_hit"), col("doc_id")))
            .as("n_docs_contaminated"),
          coalesce(every(col("bloom_hit") || !col("exact_hit")), lit(true))
            .as("no_false_negatives"),
          (sum(when(col("bloom_hit") && !col("exact_hit"), 1L).otherwise(0L))
            <= lit(0.05) * sum(when(!col("exact_hit"), 1L).otherwise(0L)))
            .as("fp_rate_ok"))
      },
      Some("""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents),
             |grams AS (SELECT DISTINCT doc_id,
             |    array_to_string(w[i.range:i.range+4], ' ') AS g
             |  FROM words, range(1, 128) i WHERE i.range <= len(w) - 4),
             |eval_snips AS (SELECT doc_id, w[1:24] AS w FROM words
             |  WHERE doc_id % 40 = 0),
             |eval_grams AS (SELECT DISTINCT
             |    array_to_string(w[i.range:i.range+4], ' ') AS g
             |  FROM eval_snips, range(1, 128) i WHERE i.range <= len(w) - 4),
             |probes AS (SELECT g2.doc_id, g2.g, eg.g IS NOT NULL AS exact_hit
             |  FROM grams g2 LEFT JOIN eval_grams eg ON g2.g = eg.g)
             |SELECT CAST(count(*) AS BIGINT) AS n_probes,
             |  CAST(sum(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT)
             |    AS exact_gram_hits,
             |  CAST(count(DISTINCT CASE WHEN exact_hit THEN doc_id END)
             |    AS BIGINT) AS n_docs_contaminated,
             |  true AS no_false_negatives,
             |  true AS fp_rate_ok
             |FROM probes""".stripMargin),
      "pipeline-op: bloom-filter decontamination (broadcast ~MB filter, no corpus join)"),

    // ---- the PRODUCTION bloom decontamination shape (q145 is its
    // verification harness): scalar-subquery bloom build + narrow
    // corpus probe + per-doc leak counts. The bloom's false positives
    // are engine-state the oracle cannot replay, so the sketch-query
    // pattern (q54/q66/q140) applies: output the exact aggregates plus
    // in-band booleans asserting the bloom contract (per-doc counts
    // never BELOW exact — no false negatives — and the FP mass under
    // the sizing bound), which the oracle pins to true. ----
    Q("q147_bloom_probe",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("w"))
        val evalSnips = words.filter(col("doc_id") % 40 === 0)
          .select(col("doc_id"), slice(col("w"), 1, 24).as("w"))
        val probed = bloomProbe(words, evalSnips)
        val exact = ngrams(words, 5)
          .join(broadcast(ngrams(evalSnips, 5).select("g").distinct()),
            Seq("g"))
          .groupBy("doc_id").agg(count(lit(1)).as("exact_leaked"))
        probed.join(exact, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"), col("leaked_grams"),
            coalesce(col("exact_leaked"), lit(0L)).as("exact_leaked"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_grams").as("total_grams"),
            sum("exact_leaked").as("exact_leaked_grams"),
            coalesce(every(col("leaked_grams") >= col("exact_leaked")),
              lit(true)).as("no_false_negatives"),
            (sum(col("leaked_grams") - col("exact_leaked")) <=
              lit(0.05) * sum(col("n_grams") - col("exact_leaked")))
              .as("fp_rate_ok"))
      },
      Some("""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents),
             |grams AS (SELECT doc_id,
             |    array_to_string(w[i.range:i.range+4], ' ') AS g
             |  FROM words, range(1, 128) i WHERE i.range <= len(w) - 4),
             |eval_snips AS (SELECT doc_id, w[1:24] AS w FROM words
             |  WHERE doc_id % 40 = 0),
             |eval_grams AS (SELECT DISTINCT
             |    array_to_string(w[i.range:i.range+4], ' ') AS g
             |  FROM eval_snips, range(1, 128) i WHERE i.range <= len(w) - 4)
             |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  CAST(count(*) AS BIGINT) AS total_grams,
             |  CAST(sum(CASE WHEN g IN (SELECT g FROM eval_grams)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS exact_leaked_grams,
             |  true AS no_false_negatives,
             |  true AS fp_rate_ok
             |FROM grams""".stripMargin),
      "pipeline-op: production bloom probe (scalar-subquery build, narrow corpus side)"),

    // ---- content-defined chunking: md5-gated boundaries on trailing
    // 3-word windows (expected chunk ≈ 16 words), per-doc chunk stats.
    // The whole computation is one codegen'd narrow map over the token
    // array — the oracle rebuilds identical boundaries from the same
    // md5 buckets. ----
    Q("q146_content_chunking",
      (s, d) => contentChunkStats(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents),
             |pos AS (SELECT doc_id, i.range AS i,
             |    array_to_string(w[i.range-2:i.range], ' ') AS g3
             |  FROM words, range(3, 1024) i WHERE i.range <= len(w) - 1),
             |bounds AS (
             |  SELECT doc_id, i FROM pos
             |  WHERE CAST(('0x' || substr(md5(g3), 1, 8)) AS BIGINT) % 16 = 0
             |  UNION ALL
             |  SELECT doc_id, len(w) FROM words),
             |chunks AS (SELECT doc_id, i,
             |    i - coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i),
             |      0) AS clen
             |  FROM bounds),
             |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             |    CAST(max(clen) AS BIGINT) AS max_chunk
             |  FROM chunks GROUP BY doc_id)
             |SELECT words.doc_id, CAST(len(words.w) AS BIGINT) AS n_tokens,
             |  n_chunks, max_chunk
             |FROM words JOIN agg USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      "pipeline-op: content-defined chunking (revision-stable boundaries, narrow codegen pass)"),

    // ---- deterministic hash-stratified sampling: keep 20% of English,
    // 60% of everything else (the up-sample-the-tail shape of real
    // training mixes), by md5 bucket — a pure narrow map with NO shuffle
    // except the tiny summary agg, no RNG state, and the same rows kept
    // on every engine and every re-run. ----
    Q("q91_hash_sample",
      (s, d) => {
        val rate = when(col("lang") === "en", 20).otherwise(60)
        Tables.documents(s, d)
          .filter(hashBucket(col("doc_id")) < rate)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("chars_kept"))
          .orderBy("lang")
      },
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
             |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept
             |FROM (SELECT *,
             |    CAST(('0x' || substr(md5('doc:' || doc_id), 1, 8)) AS BIGINT) % 100 AS bucket
             |  FROM documents)
             |WHERE bucket < (CASE WHEN lang = 'en' THEN 20 ELSE 60 END)
             |GROUP BY lang ORDER BY lang""".stripMargin),
      "pipeline-op: deterministic md5-bucket stratified sampling"),

    // ---- train/val/test split: the hash-bucket assignment every
    // training pipeline needs before anything else. Same md5 arithmetic
    // as q91 (so the split is reproducible on any engine, resumable,
    // and stable under corpus growth — a document NEVER changes split
    // when new data arrives, which Bernoulli RNG splits cannot
    // guarantee), cut at 80/10/10. Pure narrow map + one tiny
    // (lang, split) aggregate; the per-lang fraction window runs over
    // |langs| x 3 rows on the driver-scale result. ----
    Q("q126_stratified_split",
      (s, d) => {
        val b = hashBucket(col("doc_id"))
        val splitCol = when(b < 80, "train").when(b < 90, "val")
          .otherwise("test")
        val perSplit = Tables.documents(s, d)
          .select(col("lang"), splitCol.as("split"), col("n_chars"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("split_chars"))
        val w = Window.partitionBy("lang")
        perSplit
          .withColumn("frac",
            round(col("n_docs").cast("double") / sum("n_docs").over(w), 6))
          .orderBy("lang", "split")
      },
      Some("""WITH b AS (SELECT lang, n_chars,
             |    CAST(('0x' || substr(md5('doc:' || doc_id), 1, 8)) AS BIGINT)
             |      % 100 AS bucket
             |  FROM documents),
             |s AS (SELECT lang,
             |    CASE WHEN bucket < 80 THEN 'train'
             |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
             |    n_chars FROM b),
             |a AS (SELECT lang, split, COUNT(*) AS n_docs,
             |    CAST(SUM(n_chars) AS BIGINT) AS split_chars
             |  FROM s GROUP BY 1, 2)
             |SELECT lang, split, n_docs, split_chars,
             |  round(CAST(n_docs AS DOUBLE)
             |    / SUM(n_docs) OVER (PARTITION BY lang), 6) AS frac
             |FROM a ORDER BY lang, split""".stripMargin),
      "pipeline-op: deterministic train/val/test hash split (stable under growth)"),

    // ---- per-source document caps (the C4/RefinedWeb "domain cap"
    // rule: no single domain may dominate the mix). Selection is
    // deterministic — rank within source by (md5 bucket, doc_id), keep
    // the first `cap` — so the same documents survive on every engine
    // and re-run. Scale: `rk` feeds conditional aggregates (the query
    // reports kept AND total per source), so every row flows through
    // the per-source window sort — InferWindowGroupLimit does NOT fire
    // here (it needs a `rk <= k` FILTER, which would discard the
    // uncapped totals). That is the right trade for a cap REPORT; a
    // cap APPLICATION (keep only the survivors, totals not needed)
    // should filter `rk <= cap` directly and let the per-group limit
    // push below the exchange. Per-source totals partial-aggregate
    // map-side; a pathological mega-domain hot-spots its reducer, which
    // is the usual domain-cap reality — salt the rank pass per shard
    // and cap per (source, shard) if one domain exceeds a reducer. ----
    Q("q128_source_cap",
      (s, d) => {
        val cap = 15
        val w = Window.partitionBy("source")
          .orderBy(hashBucket(col("doc_id")), col("doc_id"))
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rk", row_number().over(w))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            count(when(col("rk") <= cap, lit(1))).as("n_kept"),
            sum(when(col("rk") <= cap, col("n_chars"))).as("chars_kept"))
          .orderBy("source")
      },
      Some("""WITH ranked AS (SELECT source, n_chars,
             |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
             |      CAST(('0x' || substr(md5('doc:' || doc_id), 1, 8)) AS BIGINT)
             |        % 100, doc_id) AS rk
             |  FROM documents)
             |SELECT source, COUNT(*) AS n_total,
             |  CAST(COUNT(*) FILTER (WHERE rk <= 15) AS BIGINT) AS n_kept,
             |  CAST(SUM(n_chars) FILTER (WHERE rk <= 15) AS BIGINT) AS chars_kept
             |FROM ranked GROUP BY source ORDER BY source""".stripMargin),
      "pipeline-op: per-source document caps (deterministic domain-cap rule)"),

    // ---- cap APPLICATION — q128's production twin. q128 is the cap
    // REPORT (kept AND uncapped totals per source, so every row must
    // flow through the window); the pipeline stage that actually
    // enforces the cap keeps only the survivors, which lets the
    // `rk <= cap` FILTER drive Catalyst's InferWindowGroupLimit: a
    // partial WindowGroupLimit below the exchange cuts each map
    // partition to its local top-`cap` per source BEFORE shuffling, so
    // the exchange moves O(sources x cap) rows instead of the corpus —
    // at 100 TB that is the difference between shuffling terabytes and
    // shuffling megabytes. PlanAuditSpec pins both the partial and
    // final WindowGroupLimit nodes in the physical plan. Same
    // deterministic (md5 bucket, doc_id) selection order as q128, so
    // the survivor set equals the rows q128 counts as kept. ----
    Q("q141_source_cap_apply",
      (s, d) => {
        val cap = 15
        val w = Window.partitionBy("source")
          .orderBy(hashBucket(col("doc_id")), col("doc_id"))
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= cap)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .orderBy("source", "doc_id")
      },
      Some("""WITH ranked AS (SELECT source, doc_id, n_chars,
             |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
             |      CAST(('0x' || substr(md5('doc:' || doc_id), 1, 8)) AS BIGINT)
             |        % 100, doc_id) AS rk
             |  FROM documents)
             |SELECT source, doc_id, n_chars
             |FROM ranked WHERE rk <= 15
             |ORDER BY source, doc_id""".stripMargin),
      "pipeline-op: per-source cap application (group-limit pushed below the shuffle)"),

    // ---- deterministic PPS sampling (probability proportional to
    // size): systematic threshold sampling over the cumulative weight —
    // pick the documents where the running sum of n_chars crosses a
    // multiple of step = total/k. Every engine and every re-run selects
    // the SAME ~k documents (unlike A-RES exponential keys, this needs
    // no libm pow/ln, so the oracle hash-matches on exact BIGINTs), a
    // doc's inclusion probability is proportional to its size, and a
    // doc with n_chars >= step is ALWAYS included — the weighted-
    // sampling rule mixture construction wants. Scale: the naive form
    // is one global ORDER BY cumsum — a single-partition window. Here
    // the prefix sum is SHARDED exactly like globalNtile: doc_id range
    // buckets sized by one scalar max(doc_id) read, per-bucket cumsums
    // behind the buckets' hash exchange (parallel), per-bucket totals
    // collapse to <= shuffle-partitions rows whose offsets come from a
    // bounded single-partition window and broadcast-join back. The
    // oracle runs the naive global-window form — same integers. ----
    Q("q142_pps_sample",
      (s, d) => {
        val k = 25
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val nb = s.conf.get("spark.sql.shuffle.partitions").toInt
        // one scalar read sizes cluster-bounded buckets (globalNtile's
        // boundary-job precedent)
        val maxId = docs.agg(max("doc_id")).head().getLong(0)
        val width = math.max(maxId / nb + 1, 1L)
        val bucketed = docs.withColumn("bkt", expr(s"doc_id div $width"))
        val wIn = Window.partitionBy("bkt").orderBy("doc_id")
        val local = bucketed.withColumn("lcum", sum("n_chars").over(wIn))
        val wOff = Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val offsets = bucketed.groupBy("bkt").agg(sum("n_chars").as("bsum"))
          .select(col("bkt"),
            coalesce(sum("bsum").over(wOff), lit(0L)).as("off"),
            sum("bsum").over(wAll).as("tot"))
        local.join(broadcast(offsets), "bkt")
          .withColumn("cum", col("off") + col("lcum"))
          .withColumn("step", greatest(expr(s"tot div $k"), lit(1L)))
          .filter(expr("cum div step") > expr("(cum - n_chars) div step"))
          .select(col("doc_id"), col("n_chars"), col("cum"))
          .orderBy("doc_id")
      },
      Some("""WITH c AS (SELECT doc_id, n_chars,
             |    CAST(SUM(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum,
             |    CAST(SUM(n_chars) OVER () AS BIGINT) AS tot
             |  FROM documents)
             |SELECT doc_id, n_chars, cum FROM c
             |WHERE (cum // greatest(tot // 25, 1))
             |  > ((cum - n_chars) // greatest(tot // 25, 1))
             |ORDER BY doc_id""".stripMargin),
      "pipeline-op: deterministic PPS corpus sampling (sharded prefix sum, no libm)"),

    // ---- DSIR: Data Selection with Importance Resampling (Xie et
    // al. 2023, arXiv:2302.03169) — rank the raw pool by importance
    // weights from HASHED n-gram features: per-bucket log-ratio of
    // add-one-smoothed target vs raw unigram distributions, per-doc
    // weight = sum of its bucket counts times the bucket log-ratios.
    // The 256 buckets are the first two hex chars of md5(token) — a
    // hash both engines compute identically, so the oracle replays
    // the method end to end. FP discipline is q101's: log-ratios
    // rounded to 6 decimals, per-doc contributions summed as exact
    // DECIMAL(28,12) (order-independent), ranking on the decimal.
    // Scale shape: one explode feeding two partial-agg shuffles (256
    // bucket rows; (doc,bucket) counts), weights broadcast back, one
    // doc-keyed fold — no all-pairs, no global window over data (the
    // top-k is TakeOrdered + a k-row rank window). ----
    Q("q152_dsir_importance",
      (s, d) => dsirTopK(Tables.documents(s, d),
        col("doc_id") % 7 === 0, 25),
      Some("""WITH toks AS (SELECT doc_id, doc_id % 7 = 0 AS is_tgt,
             |    unnest(string_split(text,' ')) AS tok FROM documents),
             |tb AS (SELECT doc_id, is_tgt, substr(md5(tok),1,2) AS b
             |  FROM toks),
             |buckets AS (SELECT b, count(*) AS raw_n,
             |    SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS tgt_n
             |  FROM tb GROUP BY b),
             |tot AS (SELECT SUM(raw_n) AS raw_t, SUM(tgt_n) AS tgt_t
             |  FROM buckets),
             |wts AS (SELECT b, round(ln((tgt_n + 1.0)/(tgt_t + 256.0))
             |    - ln((raw_n + 1.0)/(raw_t + 256.0)), 6) AS w
             |  FROM buckets, tot),
             |dbc AS (SELECT doc_id, b, count(*) AS c FROM tb GROUP BY 1,2),
             |scored AS (SELECT doc_id,
             |    SUM(CAST(round(c * w, 6) AS DECIMAL(28,12))) AS s
             |  FROM dbc JOIN wts USING (b) GROUP BY doc_id)
             |SELECT doc_id, round(CAST(s AS DOUBLE), 6) AS weight,
             |  CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS INT) AS rk
             |FROM scored QUALIFY rk <= 25 ORDER BY rk""".stripMargin),
      "pipeline-op: DSIR hashed-ngram importance weighting (Xie et al. 2023), top-k selection"),

    // ---- incremental-ingest dedup: dedupe a NEW batch against the
    // standing corpus by normalized-text fingerprint — the daily-crawl
    // shape (the full-corpus pair queries q40/q42 answer a different
    // question: dedup WITHIN a corpus). The batch is planted from the
    // corpus itself: every 7th document re-arrives verbatim under a new
    // id (a true re-crawl duplicate), every 7th+1 arrives with an
    // edit marker appended (genuinely new content). Scale: the corpus
    // side reduces to DISTINCT fingerprints (one md5 per doc — 16
    // bytes a row at 100 TB, the standing "seen" set every ingest
    // system maintains); the anti-join is fp-keyed shuffle on the
    // small batch vs that set, and the corpus text itself is scanned
    // once, never shuffled. ----
    Q("q130_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        def fp(c: Column) = md5(TextOps.normalizeText(c))
        val batch = docs.filter(col("doc_id") % 7 < 2)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("lang"),
            when(col("doc_id") % 7 === 1,
              concat(col("text"), lit(" edit marker")))
              .otherwise(col("text")).as("text"))
        val seen = docs.select(fp(col("text")).as("fp")).distinct()
        val stats = batch.groupBy("lang").agg(count(lit(1)).as("n_batch"))
        val fresh = batch.select(col("lang"), fp(col("text")).as("fp"))
          .join(seen, Seq("fp"), "left_anti")
          .groupBy("lang").agg(count(lit(1)).as("n_new"))
        stats.join(fresh, Seq("lang"), "left")
          .select(col("lang"), col("n_batch"),
            coalesce(col("n_new"), lit(0L)).as("n_new"),
            (col("n_batch") - coalesce(col("n_new"), lit(0L))).as("n_dup"))
          .orderBy("lang")
      },
      Some("""WITH norm AS (SELECT doc_id, lang,
             |    trim(regexp_replace(regexp_replace(
             |      translate(lower(text), 'àâäáãåèêëéìîíïòôöóõùûüúçñÿý',
             |        'aaaaaaeeeeiiiiooooouuuucnyy'),
             |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm,
             |    text
             |  FROM documents),
             |batch AS (SELECT doc_id + 3000000 AS doc_id, lang,
             |    CASE WHEN doc_id % 7 = 1 THEN md5(trim(regexp_replace(
             |        regexp_replace(translate(lower(text || ' edit marker'),
             |          'àâäáãåèêëéìîíïòôöóõùûüúçñÿý',
             |          'aaaaaaeeeeiiiiooooouuuucnyy'),
             |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
             |      ELSE md5(norm) END AS fp
             |  FROM norm WHERE doc_id % 7 < 2),
             |seen AS (SELECT DISTINCT md5(norm) AS fp FROM norm),
             |stats AS (SELECT lang, COUNT(*) AS n_batch
             |  FROM batch GROUP BY lang),
             |fresh AS (SELECT lang, COUNT(*) AS n_new FROM batch
             |  WHERE fp NOT IN (SELECT fp FROM seen) GROUP BY lang)
             |SELECT lang, n_batch, COALESCE(n_new, 0) AS n_new,
             |  n_batch - COALESCE(n_new, 0) AS n_dup
             |FROM stats LEFT JOIN fresh USING (lang)
             |ORDER BY lang""".stripMargin),
      "pipeline-op: incremental-ingest dedup vs standing fingerprint set (anti-join)"),

    // ---- sequence packing: concatenate documents in deterministic order
    // and split at fixed 512-token context boundaries; a document belongs
    // to the window where it STARTS. Packing runs per (lang, shard)
    // partition — the shard key is what makes this a 100 TB operator: a
    // single global ordering would funnel the corpus through one
    // reducer, while per-shard running sums parallelize freely and each
    // shard's windows are independently correct. ----
    Q("q92_pack_sequences",
      (s, d) => {
        val t = Tables.documents(s, d).select(col("lang"),
          (col("doc_id") % 4).as("shard"), col("doc_id"),
          size(toks(col("text"))).cast("long").as("tokens"))
        val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.withColumn("start", sum(col("tokens")).over(w) - col("tokens"))
          .withColumn("window_id", floor(col("start") / 512).cast("long"))
          .groupBy("lang", "shard", "window_id")
          .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("window_tokens"))
          .orderBy("lang", "shard", "window_id")
      },
      Some("""WITH toks AS (SELECT lang, doc_id % 4 AS shard, doc_id,
             |    len(string_split(text, ' ')) AS tokens FROM documents),
             |packed AS (SELECT lang, shard, doc_id, tokens,
             |    SUM(tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) - tokens AS start
             |  FROM toks)
             |SELECT lang, shard, CAST(start // 512 AS BIGINT) AS window_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(tokens) AS BIGINT) AS window_tokens
             |FROM packed GROUP BY lang, shard, window_id
             |ORDER BY lang, shard, window_id""".stripMargin),
      "pipeline-op: fixed-context sequence packing with shard-parallel windows"),

    // ---- repetition / boilerplate quality signals, adapted from the
    // Gopher rules (Rae et al. 2021, arXiv:2112.11446 §A1.1: documents
    // with a high duplicated-n-gram or top-n-gram fraction are removed
    // before training; fractions here are over n-gram COUNTS, not
    // characters). All signals are per-row higher-order functions over
    // the token array — local work only, NO shuffle (the explode+groupBy
    // formulation would shuffle the entire gram stream; the oracle uses
    // it because set-based SQL has no per-row arrays-of-counts, and the
    // integer count arithmetic is identical either way). The corpus has
    // no natural loops, so every 50th document PLANTS one: its first 10
    // words repeated 5 times under doc_id+2,000,000 (clear of q40's +1e6
    // injected ids and every ScaleUp replica range) — the dup-trigram
    // signal must flag exactly the planted loops (~0.79) while natural
    // docs stay near 0. ----
    Q("q93_repetition_signals",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("w"))
        val planted = words.filter(col("doc_id") % 50 === 0 && size(col("w")) >= 10)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            flatten(transform(sequence(lit(1), lit(5)),
              _ => slice(col("w"), 1, 10))).as("w"))
        def grams(n: Int): Column = transform(sequence(lit(1), size(col("w")) - (n - 1)),
          i => array_join(transform(sequence(lit(0), lit(n - 1)),
            j => element_at(col("w"), i + j)), " "))
        val all = words.filter(size(col("w")) >= 3).union(planted)
          .withColumn("bi", grams(2)).withColumn("tri", grams(3))
        all.select(
            col("doc_id"),
            size(col("w")).cast("long").as("n_words"),
            round(size(array_distinct(col("w"))).cast("double") / size(col("w")), 6)
              .as("distinct_word_frac"),
            round(topRunCount(col("bi")).cast("double")
              / size(col("bi")), 6).as("top_bigram_frac"),
            round(lit(1.0) - size(array_distinct(col("tri"))).cast("double")
              / size(col("tri")), 6).as("dup_trigram_frac"))
          .withColumn("repetitive",
            col("top_bigram_frac") >= 0.2 || col("dup_trigram_frac") >= 0.3)
          .orderBy("doc_id")
      },
      Some("""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents),
             |all_docs AS (
             |  SELECT doc_id, w FROM words WHERE len(w) >= 3
             |  UNION ALL
             |  SELECT doc_id + 2000000, flatten(list_transform(range(1, 6), x -> w[1:10]))
             |  FROM words WHERE doc_id % 50 = 0 AND len(w) >= 10),
             |bi AS (SELECT doc_id, w[i.range] || ' ' || w[i.range+1] AS g
             |  FROM all_docs, range(1, 128) i WHERE i.range <= len(w) - 1),
             |tri AS (SELECT doc_id, w[i.range] || ' ' || w[i.range+1] || ' ' || w[i.range+2] AS g
             |  FROM all_docs, range(1, 128) i WHERE i.range <= len(w) - 2),
             |bistats AS (SELECT doc_id, MAX(c) AS top_bi, SUM(c) AS n_bi FROM
             |  (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g)
             |  GROUP BY doc_id),
             |tristats AS (SELECT doc_id, COUNT(*) AS d_tri, SUM(c) AS n_tri FROM
             |  (SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY doc_id, g)
             |  GROUP BY doc_id)
             |SELECT a.doc_id, CAST(len(a.w) AS BIGINT) AS n_words,
             |  round(CAST(len(list_distinct(a.w)) AS DOUBLE) / len(a.w), 6)
             |    AS distinct_word_frac,
             |  round(CAST(b.top_bi AS DOUBLE) / b.n_bi, 6) AS top_bigram_frac,
             |  round(1.0 - CAST(t.d_tri AS DOUBLE) / t.n_tri, 6) AS dup_trigram_frac,
             |  (round(CAST(b.top_bi AS DOUBLE) / b.n_bi, 6) >= 0.2
             |    OR round(1.0 - CAST(t.d_tri AS DOUBLE) / t.n_tri, 6) >= 0.3)
             |    AS repetitive
             |FROM all_docs a JOIN bistats b ON b.doc_id = a.doc_id
             |JOIN tristats t ON t.doc_id = a.doc_id
             |ORDER BY a.doc_id""".stripMargin),
      "pipeline-op: Gopher-style repetition signals (per-row HOFs, no shuffle)"),

    // ---- PII detection + redaction: the scrub step every pre-training
    // pipeline runs before tokenization. Three detector regexes (email,
    // NANP-style phone, IPv4) deliberately restricted to syntax portable
    // across Java-regex and RE2 (character classes, bounded repeats, \b)
    // so the DuckDB oracle applies the IDENTICAL patterns; counts are
    // taken on the raw text, then redaction rewrites in a fixed order
    // (the patterns are mutually non-overlapping, so order only matters
    // for determinism). Pure narrow map — regexp_count/regexp_replace
    // are codegen'd; at 100 TB this is scan-bound with zero shuffle.
    // The synthetic corpus contains no natural PII, so every 30th
    // document PLANTS a contact line (id-derived email, phone, IP);
    // redacted text is output as an md5 so the oracle hash-compares
    // full redaction without megabyte rows. ----
    Q("q94_pii_redaction",
      (s, d) => {
        val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
        val phone = """\b\d{3}-\d{3}-\d{4}\b"""
        val ip = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
        val t = Tables.documents(s, d).select(col("doc_id"),
          when(col("doc_id") % 30 === 0,
            concat(col("text"), lit(" Contact user"), col("doc_id"),
              lit("@example.com or 555-123-4567 from 192.168.1.99")))
            .otherwise(col("text")).as("text"))
        val redacted = regexp_replace(regexp_replace(regexp_replace(
          col("text"), email, "[EMAIL]"), phone, "[PHONE]"), ip, "[IP]")
        t.select(col("doc_id"),
            regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
            regexp_count(col("text"), lit(phone)).cast("long").as("n_phones"),
            regexp_count(col("text"), lit(ip)).cast("long").as("n_ips"),
            md5(redacted).as("redacted_md5"))
          .withColumn("pii_found",
            col("n_emails") + col("n_phones") + col("n_ips") > 0)
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  CASE WHEN doc_id % 30 = 0
             |    THEN text || ' Contact user' || doc_id ||
             |      '@example.com or 555-123-4567 from 192.168.1.99'
             |    ELSE text END AS text
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             |    AS n_emails,
             |  CAST(len(regexp_extract_all(text,
             |    '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
             |  CAST(len(regexp_extract_all(text,
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
             |  md5(regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'))
             |    AS redacted_md5,
             |  (len(regexp_extract_all(text,
             |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |   + len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))
             |   + len(regexp_extract_all(text,
             |     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) > 0 AS pii_found
             |FROM t ORDER BY doc_id""".stripMargin),
      "pipeline-op: PII detect + redact (portable regexes, planted contacts)"),

    // ---- domain-mixture reweighting: flatten the corpus toward a UNIFORM
    // per-language token budget (the DoReMi/Pile-style mixing step,
    // downsample-only). Per-language char totals set a keep-rate
    // `min(100, floor(100 * fair_share / actual_share))`; documents then
    // pass the same deterministic md5 bucket gate as q91, so the sample
    // is reproducible on any engine and stable under reruns. Scale shape:
    // the rate table is |languages| rows — aggregate once (map-side
    // partial), BROADCAST it back, and the corpus itself is only ever
    // scanned, never shuffled; the final summary agg is per-language.
    // The integer rate arithmetic (exact BIGINT totals, one double
    // division, floor) is bit-identical across engines. ----
    Q("q96_mixture_reweight",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val langTotals = docs.groupBy("lang")
          .agg(sum("n_chars").as("lang_chars"))
        val totals = langTotals.agg(sum("lang_chars").as("total_chars"),
          count(lit(1)).as("n_langs"))
        val rates = langTotals.crossJoin(broadcast(totals))
          .withColumn("rate", least(lit(100L),
            floor(lit(100.0) * (col("total_chars") / col("n_langs"))
              / col("lang_chars"))))
          .select("lang", "rate")
        docs.join(broadcast(rates), Seq("lang"))
          .filter(hashBucket(col("doc_id")) < col("rate"))
          .groupBy("lang", "rate")
          .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
          .orderBy("lang")
      },
      Some("""WITH lt AS (SELECT lang, SUM(n_chars) AS lang_chars
             |  FROM documents GROUP BY lang),
             |tot AS (SELECT SUM(lang_chars) AS total_chars,
             |  COUNT(*) AS n_langs FROM lt),
             |rates AS (SELECT lang, LEAST(100, CAST(floor(
             |    100.0 * (total_chars / n_langs) / lang_chars) AS BIGINT)) AS rate
             |  FROM lt, tot),
             |kept AS (SELECT d.lang, rate, d.n_chars
             |  FROM documents d JOIN rates USING (lang)
             |  WHERE CAST(('0x' || substr(md5('doc:' || doc_id), 1, 8)) AS BIGINT)
             |    % 100 < rate)
             |SELECT lang, rate, CAST(COUNT(*) AS BIGINT) AS n_kept,
             |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept
             |FROM kept GROUP BY lang, rate ORDER BY lang""".stripMargin),
      "pipeline-op: uniform-target mixture reweighting (broadcast rate table)"),

    // ---- C4-style line-level cleanup (Raffel et al. 2020, arXiv:
    // 1910.10683 §2.2): keep only lines ending in terminal punctuation
    // with >= 3 words and no "javascript" warning; drop the whole page on
    // "lorem ipsum" or a curly brace. The synthetic docs are single-line,
    // so each PAGE is constructed deterministically: the document text as
    // a content line plus id-gated boilerplate lines (nav bar on %3,
    // too-short on %5, javascript warning on %7, lorem-ipsum page killer
    // on %97). Everything after construction is the real operator: one
    // split + two `filter` HOFs per row — a pure narrow map, no shuffle,
    // no UDF; at 100 TB this is scan-bound and the page either shrinks
    // in place or disappears. Cleaned text is emitted as an md5 so the
    // oracle hash-compares entire pages without megabyte rows. ----
    Q("q97_line_cleanup",
      (s, d) => {
        def gated(m: Int, line: String): Column =
          when(col("doc_id") % m === 0, concat(lit("\n"), lit(line)))
            .otherwise(lit(""))
        val page = concat(col("text"), lit("."),
          gated(3, "home | about | contact"),
          gated(5, "click here."),
          gated(7, "please enable javascript to view this page."),
          gated(97, "lorem ipsum dolor sit amet."))
        val lines = split(col("page"), "\n")
        val kept = filter(lines, x => x.rlike("[.!?\"]$") &&
          size(split(x, " ")) >= 3 && !x.contains("javascript"))
        val killer = exists(lines,
          x => x.contains("lorem ipsum") || x.contains("{"))
        Tables.documents(s, d).select(col("doc_id"), page.as("page"))
          .filter(!killer)
          .select(col("doc_id"),
            size(lines).cast("long").as("n_lines"),
            size(kept).cast("long").as("n_kept"),
            md5(array_join(kept, "\n")).as("cleaned_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH pages AS (SELECT doc_id, text || '.'
             |  || CASE WHEN doc_id % 3 = 0
             |       THEN chr(10) || 'home | about | contact' ELSE '' END
             |  || CASE WHEN doc_id % 5 = 0
             |       THEN chr(10) || 'click here.' ELSE '' END
             |  || CASE WHEN doc_id % 7 = 0
             |       THEN chr(10) || 'please enable javascript to view this page.'
             |       ELSE '' END
             |  || CASE WHEN doc_id % 97 = 0
             |       THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
             |    AS page
             |  FROM documents),
             |l AS (SELECT doc_id, string_split(page, chr(10)) AS lines
             |  FROM pages),
             |k AS (SELECT doc_id, lines,
             |    list_filter(lines, x -> regexp_matches(x, '[.!?"]$')
             |      AND len(string_split(x, ' ')) >= 3
             |      AND NOT contains(x, 'javascript')) AS kept
             |  FROM l
             |  WHERE len(list_filter(lines, x -> contains(x, 'lorem ipsum')
             |    OR contains(x, '{'))) = 0)
             |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
             |  CAST(len(kept) AS BIGINT) AS n_kept,
             |  md5(array_to_string(kept, chr(10))) AS cleaned_md5
             |FROM k ORDER BY doc_id""".stripMargin),
      "pipeline-op: C4-style line cleanup (narrow HOF filters, page kill)"),

    // ---- sliding-window chunking: split each document into 16-token
    // windows advancing by a 12-token stride (4-token overlap carries
    // context across boundaries), the tokenizer-prep step between
    // curation and training. One `sequence`+`explode` per row — row-local
    // generation, no shuffle; a document's chunk count depends only on
    // its own length, so the operator scales linearly with corpus bytes
    // and chunks inherit the parent scan's partitioning. The final chunk
    // is allowed to run short (slice clamps at the document end; both
    // engines clamp identically). ----
    Q("q99_chunk_stride",
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("w"))
          .withColumn("n", size(col("w")))
        val nChunks = (floor((greatest(col("n") - 16, lit(0)) + 11)
          / lit(12.0)) + 1).cast("int")
        val start = (col("chunk_id") * 12).cast("int")
        t.select(col("doc_id"), col("w"), col("n"),
            explode(sequence(lit(0L), nChunks.cast("long") - 1)).as("chunk_id"))
          .select(col("doc_id"), col("chunk_id"),
            least(lit(16), col("n") - start).cast("long").as("n_tokens"),
            md5(array_join(slice(col("w"), start + 1, lit(16)), " "))
              .as("chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH wds AS (SELECT doc_id, string_split(text, ' ') AS w,
             |    len(string_split(text, ' ')) AS n FROM documents)
             |SELECT doc_id, i.range AS chunk_id,
             |  CAST(LEAST(16, n - i.range * 12) AS BIGINT) AS n_tokens,
             |  md5(array_to_string(w[i.range * 12 + 1 : i.range * 12 + 16], ' '))
             |    AS chunk_md5
             |FROM wds, range(0, 16) i
             |WHERE i.range < 1 + ((GREATEST(n - 16, 0) + 11) // 12)
             |ORDER BY doc_id, chunk_id""".stripMargin),
      "pipeline-op: sliding-window chunking with stride overlap (row-local)"),

    // ---- corpus-global line dedup, the C4 "discard repeated spans"
    // rule: documents are segmented into 12-word lines and every line
    // that already occurred anywhere earlier in the corpus (first
    // occurrence by (doc_id, line_no)) is removed; surviving lines are
    // reassembled in order. Every 25th document is PLANTED as a full
    // copy under +3,000,000 (clear of q93's +2M and q40's +1M id
    // ranges) — planted copies must come out EMPTY (n_kept = 0), while
    // the corpus's ~96 natural short-tail-line collisions dedup too.
    // Scale shape: one shuffle, keyed by the line content, decides
    // keep-first globally (at 100 TB the key would be the line's hash,
    // same decisions); reassembly groups by doc_id with an ordered
    // collect. No all-pairs term anywhere — cost is linear in corpus
    // lines for any corpus size. ----
    Q("q100_line_dedup_global",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("w"))
        val corpus = base.unionByName(base.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("w")))
        val lines = corpus
          .select(col("doc_id"), explode(transform(
            sequence(lit(0), (floor((size(col("w")) + 11) / lit(12.0)))
              .cast("int") - 1),
            i => struct(i.cast("long").as("line_no"),
              array_join(slice(col("w"), i * 12 + 1, lit(12)), " ").as("line"))))
            .as("x"))
          .select(col("doc_id"), col("x.line_no"), col("x.line"))
        val firstSeen = Window.partitionBy("line").orderBy("doc_id", "line_no")
        lines.withColumn("kept", row_number().over(firstSeen) === 1)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_lines"),
            sum(col("kept").cast("long")).as("n_kept"),
            md5(array_join(transform(
              array_sort(collect_list(when(col("kept"),
                struct(col("line_no"), col("line"))))),
              p => p.getField("line")), "\n")).as("cleaned_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |  UNION ALL
             |  SELECT doc_id + 3000000, string_split(text, ' ')
             |  FROM documents WHERE doc_id % 25 = 0),
             |lines AS (SELECT doc_id, i.range AS line_no,
             |    array_to_string(w[i.range * 12 + 1 : i.range * 12 + 12], ' ')
             |      AS line
             |  FROM base, range(0, 16) i WHERE i.range < (len(w) + 11) // 12),
             |marked AS (SELECT doc_id, line_no, line,
             |    (ROW_NUMBER() OVER (PARTITION BY line
             |      ORDER BY doc_id, line_no)) = 1 AS kept
             |  FROM lines)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
             |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  md5(COALESCE(string_agg(CASE WHEN kept THEN line END, chr(10)
             |    ORDER BY line_no), '')) AS cleaned_md5
             |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "pipeline-op: corpus-global line dedup, keep-first (C4 repeated spans)"),

    // ---- duplicated n-gram span detection (the exact-substring-dedup
    // SIGNAL of Lee et al. 2022, "Deduplicating Training Data Makes
    // Language Models Better"): for every document, how many of its
    // word 8-gram positions are duplicated ANYWHERE in the corpus
    // (including within the same document). Plan: one narrow gram-
    // explode pass (md5 of each gram so the shuffle key is fixed-width
    // regardless of gram text), a gram-keyed partial-agg count, a
    // shuffle join of grams back to their corpus-wide multiplicity,
    // and a per-doc re-aggregation. Cost is linear in corpus grams —
    // no all-pairs term — and every stage partial-aggregates, so the
    // 100 TB shape is two shuffles of (hash, count)-width rows. The
    // left join back to `documents` keeps zero-dup and short (<8-token)
    // documents in the output with explicit zeros. ----
    Q("q103_dup_ngram_spans",
      (s, d) => dupNgramSpans(graft.operators.Spread.byKey(
          Tables.documents(s, d), col("doc_id")))
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, string_split(text,' ') AS w
             |  FROM documents),
             |idx AS (SELECT doc_id, w,
             |    unnest(range(0, greatest(len(w)-7, 0))) AS i FROM toks),
             |grams AS (SELECT doc_id, array_to_string(w[i+1:i+8],' ') AS g
             |  FROM idx),
             |gcounts AS (SELECT g, count(*) AS total FROM grams GROUP BY g),
             |per_doc AS (SELECT doc_id,
             |    count(*) AS n_grams,
             |    count(*) FILTER (WHERE total > 1) AS dup_pos,
             |    count(DISTINCT g) FILTER (WHERE total > 1) AS dup_grams
             |  FROM grams JOIN gcounts USING (g) GROUP BY doc_id)
             |SELECT d.doc_id,
             |  COALESCE(n_grams, 0) AS n_grams,
             |  COALESCE(dup_pos, 0) AS dup_pos,
             |  COALESCE(dup_grams, 0) AS dup_grams,
             |  round(CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0
             |    ELSE CAST(dup_pos AS DOUBLE)/n_grams END, 6) AS dup_frac
             |FROM documents d LEFT JOIN per_doc USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      "pipeline-op: duplicated 8-gram span detection (exact-substring dedup signal)"),

    // ---- curation pipeline v2: the round-5 signals composed end to
    // end — normalize (q104's fold/collapse) -> unigram-typicality gate
    // (q102's common-token ratio, >= 20%) -> exact dedup on the
    // NORMALIZED fingerprint (first doc_id wins, as a min_by hash
    // aggregate — map-side combine, no window sort) -> per-language
    // rollup using the table's real lang column. Three shuffles total
    // at any scale: the vocabulary partial-agg, the fingerprint dedup,
    // and the rollup; everything else is narrow. The avg ratio sums
    // through DECIMAL so the rollup is partition-order-independent. ----
    Q("q116_curation_v2",
      (s, d) => {
        val normed = graft.operators.Spread.byKey(
            Tables.documents(s, d), col("doc_id"))
          .select(col("doc_id"), col("lang"),
            TextOps.normalizeText(col("text")).as("norm"))
        val toks = normed.select(col("doc_id"),
          explode(split(col("norm"), " ")).as("tok"))
        // vocabulary pass off the RAW scan (reduce-only — it must not pay
        // the Spread exchange; same policy as unigramQuality)
        val vocab = Tables.documents(s, d)
          .select(explode(split(TextOps.normalizeText(col("text")), " "))
            .as("tok"))
        val scored = RetrievalOps.commonTokenScores(toks, vocab, 10)
          .select("doc_id", "n_tokens", "common_hits")
        val gated = normed.join(scored, Seq("doc_id"))
          .filter(col("n_tokens") >= 10 &&
            col("common_hits") * 5 >= col("n_tokens"))
          .select(col("doc_id"), col("lang"), md5(col("norm")).as("fp"),
            col("n_tokens"),
            round(col("common_hits").cast("double") / col("n_tokens"), 6)
              .as("common_ratio"))
        val kept = gated.groupBy("fp")
          .agg(min_by(struct(col("doc_id"), col("lang"), col("n_tokens"),
            col("common_ratio")), col("doc_id")).as("e"))
          .select("e.*")
        kept.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            round(sum(col("common_ratio").cast("decimal(28,12)"))
              .cast("double") / count(lit(1)), 6).as("avg_common_ratio"))
          .orderBy("lang")
      },
      Some("""WITH normed AS (SELECT doc_id, lang,
             |    trim(regexp_replace(regexp_replace(
             |      translate(lower(text), 'àâäáãåèêëéìîíïòôöóõùûüúçñÿý',
             |        'aaaaaaeeeeiiiiooooouuuucnyy'),
             |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
             |  FROM documents),
             |toks AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok
             |  FROM normed),
             |counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
             |top10 AS (SELECT tok FROM counts ORDER BY c DESC, tok LIMIT 10),
             |scored AS (SELECT doc_id, count(*) AS n_tokens,
             |    count(*) FILTER (WHERE tok IN (SELECT tok FROM top10))
             |      AS common_hits
             |  FROM toks GROUP BY doc_id),
             |gated AS (SELECT n.doc_id, lang, md5(norm) AS fp, n_tokens,
             |    round(CAST(common_hits AS DOUBLE) / n_tokens, 6)
             |      AS common_ratio
             |  FROM normed n JOIN scored s ON n.doc_id = s.doc_id
             |  WHERE n_tokens >= 10 AND common_hits * 5 >= n_tokens),
             |kept AS (SELECT * FROM gated
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             |  round(CAST(SUM(CAST(common_ratio AS DECIMAL(28,12))) AS DOUBLE)
             |    / count(*), 6) AS avg_common_ratio
             |FROM kept GROUP BY lang ORDER BY lang""".stripMargin),
      "pipeline-op: curation v2 — normalize, typicality gate, dedup, lang rollup")
  )
}
