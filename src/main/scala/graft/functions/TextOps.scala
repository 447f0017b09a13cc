package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristics, document fingerprinting.
  * All pure Catalyst expressions (split / filter / regexp_replace / md5) —
  * codegen'd, no UDFs, trivially parallel at 100 TB (narrow per-row maps,
  * no shuffle at all except the final presentation ORDER BY).
  */
object TextOps {

  /** Latin-1 accent fold table (1:1 codepoints, applied after lower()). */
  private[graft] val foldFrom = "àâäáãåèêëéìîíïòôöóõùûüúçñÿý"
  private[graft] val foldTo   = "aaaaaaeeeeiiiiooooouuuucnyy"
  /** Normalization regex — shared with the `graft_normalize` SQL UDF
    * (Graft.registerSqlUdfs) so the two surfaces cannot drift. One pass:
    * every maximal run of non-alphanumerics (punctuation, control chars,
    * AND the spaces between them) becomes a single space — provably the
    * same result as the historical two-pass form (strip `[^a-z0-9 ]` to
    * spaces, then collapse `' +'`) that the DuckDB oracles still run,
    * which makes the oracle an independent cross-check of the
    * equivalence on every corpus hash (and RetrievalOpsSpec pins it on
    * adversarial strings). Measured honestly (Microbench `normalize`):
    * WALL-FLAT at local scale — the scan dominates and both forms read
    * ~0.12 s — so the reason to prefer one pass is allocation, not CPU:
    * each regexp_replace materializes a full-size intermediate string
    * per row, and this function runs over every byte of
    * q100/q102/q104/q116/q127/q130's input, so dropping a pass halves
    * the transient garbage of the normalize step at 100 TB.
    */
  private[graft] val normPattern = "[^a-z0-9]+"

  /** Canonical text normalization: lowercase, pinned accent-fold table,
    * control/punctuation removal, whitespace collapse. A pure codegen'd
    * Column expression — see the q104 docstring. SQL-text callers get the
    * same semantics via the `graft_normalize` SQL UDF ([[graft.Graft
    * .registerSqlUdfs]]).
    */
  def normalizeText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(
      translate(lower(c), foldFrom, foldTo), normPattern, " "))

  /** THE exact-dedup fingerprint: md5 of the text lowercased, stripped
    * to [a-z0-9 ], space-collapsed, trimmed — strip-to-EMPTY, a
    * deliberately different normalization from [[normalizeText]]'s
    * strip-to-space. One definition shared by q49 (the standalone
    * fingerprint query) and q74 (the pipeline's dedup key) so the two
    * cannot drift; the DuckDB mirrors replicate the same two regexes.
    */
  private def contentFingerprint(text: org.apache.spark.sql.Column) =
    md5(trim(regexp_replace(regexp_replace(lower(text),
      "[^a-z0-9 ]", ""), " +", " ")))

  def qs: Seq[Q] = Seq(

    // ---- bigram language-model table: conditional probabilities
    // p(y|x) = c(x,y) / sum_y c(x,y) as exact integer-count ratios
    // (rounded once at output — no libm in the pipeline), with a
    // min-count floor. The context totals derive FROM the bigram
    // relation itself (one aggregate tree, self-consistent with the
    // floor's denominator). Scale: the bigram explode is a narrow map
    // off the scan; the only exchange is the (x,y)-keyed partial agg
    // whose state is vocabulary-bounded (word-level vocabularies fit;
    // the context-total join is x-keyed and auto-broadcasts while the
    // vocab does, shuffle-joins past it — same degrade contract as
    // q102). ----
    Q("q127_bigram_lm",
      (s, d) => {
        val t = graft.operators.Spread.byKey(
            Tables.documents(s, d), col("doc_id"))
          .select(split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 2)
        val bg = t.select(explode(transform(
            sequence(lit(1), size(col("w")) - 1),
            i => struct(element_at(col("w"), i).as("x"),
              element_at(col("w"), i + 1).as("y")))).as("b"))
          .select(col("b.x").as("x"), col("b.y").as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
        val ctx = bg.groupBy("x").agg(sum("c_xy").as("c_x"))
        bg.join(ctx, Seq("x"))
          .filter(col("c_xy") >= 5)
          .select(col("x"), col("y"), col("c_xy"), col("c_x"),
            round(col("c_xy").cast("double") / col("c_x"), 6).as("p"))
          .orderBy("x", "y")
      },
      Some("""WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT w, unnest(range(1, len(w))) AS i
             |  FROM toks WHERE len(w) >= 2),
             |bg AS (SELECT w[i] AS x, w[i + 1] AS y FROM idx),
             |c AS (SELECT x, y, COUNT(*) AS c_xy FROM bg GROUP BY 1, 2),
             |ctx AS (SELECT x, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM c GROUP BY x)
             |SELECT x, y, c_xy, c_x,
             |  round(CAST(c_xy AS DOUBLE) / c_x, 6) AS p
             |FROM c JOIN ctx USING (x) WHERE c_xy >= 5
             |ORDER BY x, y""".stripMargin),
      "pipeline-op: bigram LM conditional-probability table (exact count ratios)"),

    // ---- token counts + quality scoring ----
    Q("q47_text_stats",
      (s, d) => {
        val words = split(col("text"), " ")
        val stop = filter(words, w => w === "the" || w === "a" || w === "of")
        Tables.documents(s, d).select(
          col("doc_id"),
          size(words).as("n_tokens"),
          length(col("text")).as("n_chars"),
          round(size(stop).cast("double") / size(words), 6).as("stopword_ratio"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  length(text) AS n_chars,
             |  round(CAST(len(list_filter(string_split(text, ' '),
             |    w -> w IN ('the','a','of'))) AS DOUBLE)
             |    / len(string_split(text, ' ')), 6) AS stopword_ratio
             |FROM documents ORDER BY doc_id""".stripMargin),
      "pipeline-op: token counting + quality scoring (length/stopword ratios)"),

    // ---- language-ID heuristic: stopword votes ----
    Q("q48_text_langid",
      (s, d) => {
        val words = split(col("text"), " ")
        val enHits = size(filter(words, w => w === "the" || w === "a"))
        Tables.documents(s, d).select(
          col("doc_id"),
          enHits.as("en_hits"),
          size(words).as("n_tokens"),
          when(enHits * 5 >= size(words), "en")
            .when(enHits > 0, "maybe-en")
            .otherwise(lit("unknown")).as("lang_guess"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS en_hits,
             |  len(string_split(text,' ')) AS n_tokens,
             |  CASE WHEN len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) * 5
             |         >= len(string_split(text,' ')) THEN 'en'
             |       WHEN len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) > 0
             |         THEN 'maybe-en'
             |       ELSE 'unknown' END AS lang_guess
             |FROM documents ORDER BY doc_id""".stripMargin),
      "pipeline-op: n-gram/stopword language-ID heuristic"),

    // ---- native token_count expression (custom codegen'd Expression) ----
    Q("q55_token_count_native",
      (s, d) => {
        GraftFunctions.register(s)
        Tables.documents(s, d).select(
          col("doc_id"),
          GraftFunctions.token_count(col("text")).as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
      "custom Catalyst Expression: single-pass token count, no array alloc"),

    // ---- BPE-ish regex token counting (subword-style segmentation) ----
    Q("q69_bpe_token_count",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("n_bpe_tokens"),
        size(split(col("text"), " ")).as("n_ws_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
             |  len(string_split(text, ' ')) AS n_ws_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
      "pipeline-op: token counting — whitespace + BPE-ish regex segmentation"),

    // ---- rolling-hash (character-shingle) fingerprint ----
    Q("q70_rolling_hash_fingerprint",
      (s, d) => {
        // 5-char rolling windows -> md5 -> min per seed: a compact
        // winnowing-style content fingerprint robust to local edits
        val windows = graft.operators.Spread.byKey(
            Tables.documents(s, d), col("doc_id"))
          .select(col("doc_id"),
            explode(sequence(lit(1), greatest(length(col("text")) - 4, lit(1)))).as("i"),
            col("text"))
          .select(col("doc_id"), expr("substring(text, i, 5)").as("g"))
        windows.groupBy("doc_id").agg(
          min(md5(concat(lit("0:"), col("g")))).as("fp0"),
          min(md5(concat(lit("1:"), col("g")))).as("fp1"),
          min(md5(concat(lit("2:"), col("g")))).as("fp2"))
          .orderBy("doc_id")
      },
      Some("""WITH idx AS (
             |  SELECT doc_id, text,
             |    unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i
             |  FROM documents),
             |windows AS (SELECT doc_id, substr(text, CAST(i AS INT), 5) AS g FROM idx)
             |SELECT doc_id,
             |  MIN(md5('0:' || g)) AS fp0,
             |  MIN(md5('1:' || g)) AS fp1,
             |  MIN(md5('2:' || g)) AS fp2
             |FROM windows GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "pipeline-op: rolling-hash character-shingle fingerprint (winnowing-style)"),

    // ---- canonical-form document fingerprint ----
    Q("q49_text_fingerprint",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        contentFingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(regexp_replace(lower(text),
             |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin),
      "pipeline-op: document fingerprinting (normalized-content hash)"),

    // ---- end-to-end training-data pipeline: quality gate -> exact dedup
    // (first doc_id wins per normalized fingerprint) -> language bucket ->
    // corpus stats. One narrow pass for scoring, one shuffle for the
    // dedup window, one partial-agg shuffle for the rollup — the 100 TB
    // shape of a pretraining-corpus curation job. ----
    Q("q74_doc_pipeline",
      (s, d) => {
        val words = split(col("text"), " ")
        val scored = graft.operators.Spread.byKey(
            Tables.documents(s, d), col("doc_id")).select(
          col("doc_id"),
          size(words).as("n_tokens"),
          size(filter(words, w => w === "the" || w === "a" || w === "of"))
            .as("stop_hits"),
          size(filter(words, w => w === "the" || w === "a")).as("en_hits"),
          contentFingerprint(col("text")).as("fp"))
        // first-wins dedup as a hash aggregate (min_by), not a window
        // sort: map-side combine shrinks each fp group before the shuffle
        val kept = scored
          .filter(col("n_tokens") >= 10 && col("stop_hits") > 0)
          .groupBy("fp")
          .agg(min_by(struct(col("doc_id"), col("n_tokens"),
            col("stop_hits"), col("en_hits")), col("doc_id")).as("e"))
          .select("e.*")
        kept.select(
          when(col("en_hits") * 5 >= col("n_tokens"), "en")
            .when(col("en_hits") > 0, "maybe-en")
            .otherwise(lit("unknown")).as("lang_guess"),
          col("n_tokens"), col("stop_hits"))
          .groupBy("lang_guess")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            round(sum((col("stop_hits").cast("double") / col("n_tokens"))
              .cast("decimal(28,12)")).cast("double") / count(lit(1)), 6)
              .as("avg_stop_ratio"))
          .orderBy("lang_guess")
      },
      Some("""WITH scored AS (SELECT doc_id,
             |  len(string_split(text,' ')) AS n_tokens,
             |  len(list_filter(string_split(text,' '),
             |    w -> w IN ('the','a','of'))) AS stop_hits,
             |  len(list_filter(string_split(text,' '),
             |    w -> w IN ('the','a'))) AS en_hits,
             |  md5(trim(regexp_replace(regexp_replace(lower(text),
             |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
             |  FROM documents),
             |kept AS (SELECT * FROM scored
             |  WHERE n_tokens >= 10 AND stop_hits > 0
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
             |SELECT CASE WHEN en_hits * 5 >= n_tokens THEN 'en'
             |            WHEN en_hits > 0 THEN 'maybe-en'
             |            ELSE 'unknown' END AS lang_guess,
             |  COUNT(*) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             |  round(CAST(SUM(CAST(CAST(stop_hits AS DOUBLE) / n_tokens
             |    AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS avg_stop_ratio
             |FROM kept GROUP BY 1 ORDER BY lang_guess""".stripMargin),
      "pipeline-op: end-to-end corpus curation (quality gate, dedup, langid, stats)"),

    // ---- higher-order array functions (lambda surface, all codegen'd) ----
    Q("q79_higher_order_funcs",
      (s, d) => {
        val words = split(col("text"), " ")
        Tables.documents(s, d).select(
          col("doc_id"),
          size(filter(words, w => length(w) > 3)).as("n_long_words"),
          exists(words, _ === "the").as("has_the"),
          aggregate(words, lit(0L), (acc, w) => acc + length(w))
            .as("total_chars"),
          array_join(slice(sort_array(words), 1, 3), ",").as("first3"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  len(list_filter(string_split(text,' '), w -> length(w) > 3))
             |    AS n_long_words,
             |  list_contains(string_split(text,' '), 'the') AS has_the,
             |  CAST(list_sum(list_transform(string_split(text,' '),
             |    w -> length(w))) AS BIGINT) AS total_chars,
             |  array_to_string(list_sort(string_split(text,' '))[1:3], ',')
             |    AS first3
             |FROM documents ORDER BY doc_id""".stripMargin),
      "§2.6 expression surface: higher-order lambdas (filter/exists/aggregate/slice)"),

    // ---- text normalization: the canonicalization pass a corpus gets
    // before fingerprinting/dedup — lowercase, accent folding (explicit
    // translate map, so the folding is a pinned engine-independent
    // table, not a locale call), control/punctuation removal, and
    // whitespace collapse. The corpus is ASCII by construction, so an
    // accented suffix ("Café Über naïve résumé" + a tab) is APPENDED to
    // every document to make the folding observable and oracle-checked.
    // Pure narrow map — codegen'd string expressions, no shuffle except
    // the presentation sort; linear at any scale. ----
    Q("q104_text_normalize",
      (s, d) => {
        val norm = normalizeText(
          concat(col("text"), lit(" Café Über naïve résumé\t")))
        Tables.documents(s, d).select(
          col("doc_id"),
          md5(norm).as("norm_fp"),
          length(norm).as("norm_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(regexp_replace(
             |    translate(lower(text || ' Café Über naïve résumé' || chr(9)),
             |      'àâäáãåèêëéìîíïòôöóõùûüúçñÿý', 'aaaaaaeeeeiiiiooooouuuucnyy'),
             |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_fp,
             |  length(trim(regexp_replace(regexp_replace(
             |    translate(lower(text || ' Café Über naïve résumé' || chr(9)),
             |      'àâäáãåèêëéìîíïòôöóõùûüúçñÿý', 'aaaaaaeeeeiiiiooooouuuucnyy'),
             |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_len
             |FROM documents ORDER BY doc_id""".stripMargin),
      "pipeline-op: text normalization (case/accent fold, control strip, ws collapse)"),

    // ---- one BPE vocabulary-induction step: the distributed half of
    // tokenizer training. Count every ADJACENT token pair across the
    // corpus and emit the top merge candidates — exactly the statistic
    // a BPE trainer recomputes per merge round (Sennrich et al. 2016).
    // Pair extraction is a narrow map (transform over an index
    // sequence, no self-join); the count is one token-pair-keyed
    // partial agg; top-10 is a TakeOrdered, not a full sort. At 100 TB
    // each round is therefore one scan + one shuffle of (pair, count)
    // partials — the iteration driver would re-run this with the
    // merged vocabulary applied, state that lives in the (tiny)
    // merge table, not in the corpus. ----
    Q("q106_bpe_merge_step",
      (s, d) => {
        val w = split(col("text"), " ")
        // workFactor 16: the pair explode emits one ~2-token string per
        // input token, a >=10x row/byte expansion past the scan — the
        // spread gate must see the post-explode job size (measured at
        // sf0.1: serial 2.7 s vs spread 0.66 s; at scale the input
        // splits already exceed parallelism and the factor is moot)
        val pairs = graft.operators.Spread.byKey(
            Tables.documents(s, d), col("doc_id"), workFactor = 16.0)
          .select(explode(when(size(w) >= 2,
            transform(sequence(lit(1), size(w) - 1),
              i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
            .otherwise(array().cast("array<string>"))).as("pair"))
        // top-10 via TakeOrdered (distributed per-partition top + merge),
        // THEN rank the 10 survivors — a global row_number over all pairs
        // would funnel the whole count table through one partition
        pairs.groupBy("pair").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair")).limit(10)
          .select(col("pair"), col("n"),
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("n").desc, col("pair"))).as("rk"))
          .orderBy(col("n").desc, col("pair"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text,' ') AS w
             |  FROM documents),
             |idx AS (SELECT doc_id, w,
             |    unnest(range(1, greatest(len(w), 1))) AS i FROM toks),
             |pairs AS (SELECT w[i] || ' ' || w[i+1] AS pair FROM idx),
             |counts AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair)
             |SELECT pair, n,
             |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS INT) AS rk
             |FROM counts ORDER BY n DESC, pair LIMIT 10""".stripMargin),
      "pipeline-op: BPE merge-step statistics (adjacent-pair counts, top candidates)")
  )
}
