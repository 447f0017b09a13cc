package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (Array[Float], 64-dim).
  *
  * Brute-force cosine top-k is the correctness baseline (broadcast the small
  * query side against the full table — one narrow pass, no shuffle of the
  * big side). The scale path is [[lshTopK]]: sign-random-hyperplane LSH
  * buckets candidates so each query only scores its bucket. Both share the
  * same expression-level dot product (`zip_with` + `aggregate` on doubles —
  * codegen'd, no UDF).
  *
  * Results round cosine to 6 decimals with vec_id tie-breaks so rankings
  * are stable across summation orders (oracle parity).
  */
object SimilarityOps {

  /** embeddings with double-cast vector and precomputed L2 norm. */
  def withNorm(df: DataFrame): DataFrame =
    df.withColumn("vec", transform(col("embedding"), x => x.cast("double")))
      .withColumn("norm", sqrt(aggregate(col("vec"), lit(0.0), (acc, x) => acc + x * x)))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Brute-force cosine top-k of `queries` against `base` (both from
    * withNorm). Broadcast the query side; rank per query.
    */
  def cosineTopK(queries: DataFrame, base: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("vec").as("qvec"),
      col("norm").as("qnorm"))
    val scored = base.join(broadcast(q))
      .withColumn("cosine", round(dot(col("qvec"), col("vec")) /
        (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("cosine"), col("rk"))
  }

  /** Deterministic sign-hyperplane weights: +1/-1 from md5 parity — no RNG
    * state to ship to executors, and reproducible across engines (the same
    * parity is computable in SQL from `md5('t:b:i')`).
    */
  def signPlanes(nTables: Int, bitsPerTable: Int,
      dims: Int = 64): Seq[Seq[Seq[Double]]] = {
    // one digest instance for the whole grid (digest() resets state) —
    // getInstance per (table, bit, dim) is ~20k provider lookups at the
    // q44 defaults, re-paid per executor on the interpreted path
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nTables).map { t =>
      (0 until bitsPerTable).map { b =>
        (0 until dims).map { i =>
          val hex = md.digest(s"$t:$b:$i".getBytes("UTF-8"))
          if ((hex(0) & 1) == 0) 1.0 else -1.0
        }
      }
    }
  }

  /** Explode `df` (with a `vec` column) into one row per hash table with
    * that table's bucket id, via the codegen'd [[SignLshBuckets]]
    * expression — one tight loop per row instead of nTables*bitsPerTable
    * interpreted higher-order dot products (which at q44's 32x10 defaults
    * cost 320 array allocations per row). Bucketing stays a pure narrow
    * map: no join, no shuffle, one scan pass regardless of nTables.
    */
  def withBuckets(df: DataFrame, nTables: Int, bitsPerTable: Int): DataFrame =
    df.withColumn("__buckets",
        SignLsh.buckets(df.sparkSession, col("vec"), nTables, bitsPerTable))
      .select(col("*"), posexplode(col("__buckets")).as(Seq("t", "bucket")))
      .drop("__buckets")

  /** Multi-table sign-LSH ANN: `nTables` independent hash tables of
    * `bitsPerTable` deterministic hyperplanes each (md5-parity weights — no
    * RNG state to ship). A base vector is a candidate for a query if they
    * share a bucket in ANY table; candidates are deduped, then scored
    * exactly. The 100 TB path: the per-table bucket join replaces the cross
    * product, and recall is tuned by (nTables, bitsPerTable) instead of
    * scan size.
    */
  def lshTopK(queries: DataFrame, base: DataFrame,
      k: Int, nTables: Int = 4, bitsPerTable: Int = 4): DataFrame = {
    val qb = withBuckets(queries, nTables, bitsPerTable)
      .select(col("vec_id").as("qid"), col("t"), col("bucket"))
    val candidates = withBuckets(base.select("vec_id", "vec"), nTables, bitsPerTable)
      .select("vec_id", "t", "bucket")
      .join(broadcast(qb), Seq("t", "bucket"))
      .select("qid", "vec_id").distinct()
    val scored = candidates
      .join(base.select(col("vec_id"), col("vec"), col("norm")), Seq("vec_id"))
      .join(broadcast(queries.select(col("vec_id").as("qid"), col("vec").as("qvec"),
        col("norm").as("qnorm"))), Seq("qid"))
      .withColumn("cosine", round(dot(col("qvec"), col("vec")) /
        (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("cosine"), col("rk"))
  }

  /** Embedding-cosine near-duplicate PAIRS with LSH-bucketed candidate
    * generation: two vectors are compared only if they share a bucket in
    * at least one hash table — an equi-join on (table, bucket) — then every
    * candidate pair is scored EXACTLY and thresholded. The all-pairs
    * cross-product form (the DuckDB oracle for q44) is the correctness
    * baseline; this is the shape that survives 100 TB, where a
    * BroadcastNestedLoopJoin over the corpus is the textbook scale-killer.
    *
    * The parameters must bound BOTH error directions, not just misses:
    *  - recall: a pair at cosine c collides in one table with probability
    *    p1(c) = (1 - acos(c)/pi)^bitsPerTable, so the miss probability is
    *    (1 - p1(c))^nTables. With the defaults (10 bits, 32 tables):
    *    miss(0.995) ~ 1e-18, miss(0.95) ~ 1.4e-6, miss(0.9) ~ 4.8e-4,
    *    miss(0.85) ~ 7e-3, miss(0.8) ~ 3.3e-2.
    *  - candidate rate: an UNRELATED pair (cosine ~ 0, p1 = 2^-bits) is a
    *    candidate with probability 1 - (1 - 2^-bits)^nTables ~ 3.1% — the
    *    fraction of the n^2/2 cross product that survives to exact scoring.
    *    (The former 2-bit default made this ~99%: the bucketing pruned
    *    nothing and the operator was all-pairs in disguise.)
    * So the defaults target true near-duplicates (cosine >= 0.85) with
    * <= 1% miss while pruning ~97% of random pairs. The planes are
    * deterministic, so both rates are fixed properties of a dataset;
    * [[graft.StreamingAndSimilaritySpec]] pins the candidate-rate bound
    * and exact agreement with the brute-force baseline on the q44 corpus.
    */
  def neardupPairs(e: DataFrame, threshold: Double,
      nTables: Int = 32, bitsPerTable: Int = 10): DataFrame =
    neardupCandidates(e, nTables, bitsPerTable)
      .join(e.select(col("vec_id").as("id1"), col("vec").as("v1"),
        col("norm").as("n1")), Seq("id1"))
      .join(e.select(col("vec_id").as("id2"), col("vec").as("v2"),
        col("norm").as("n2")), Seq("id2"))
      .withColumn("cosine", round(dot(col("v1"), col("v2")) /
        (col("n1") * col("n2")), 6))
      .filter(col("cosine") >= threshold)
      .select("id1", "id2", "cosine")

  /** `base` (vec_id, embedding) plus one planted near-duplicate per row:
    * every dimension scaled by 1.1 (even 0-based dims) or 0.9 (odd dims).
    * The perturbation is ~orthogonal to any vector, so each planted copy
    * sits at cosine ~ 1/sqrt(1.01) ~ 0.995 from its source while cross
    * pairs keep their (near-orthogonal) similarity — a deterministic
    * near-dup workload both engines can construct with identical double
    * arithmetic (no float round-trip).
    */
  def withPlantedDups(base: DataFrame, idOffset: Long = 100000L): DataFrame = {
    val b = base.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    b.unionByName(b.select((col("vec_id") + idOffset).as("vec_id"),
      perturbDup(col("embedding")).as("embedding")))
  }

  /** THE planted-near-dup perturbation (1.1 on even 0-based dims, 0.9 on
    * odd) — one definition shared by [[withPlantedDups]] and q129 so the
    * cross-query guarantee (every planted copy sits at the same cosine
    * ~0.995 from its source) cannot drift between call sites; the DuckDB
    * oracles mirror the same CASE arithmetic.
    */
  private[graft] def perturbDup(emb: Column): Column =
    transform(emb, (x, i) => x.cast("double") *
      when(i % 2 === 0, lit(1.1)).otherwise(lit(0.9)))

  /** The surviving (id1 < id2) candidate pairs under the banded bucket
    * join — the pruning stage of [[neardupPairs]], exposed so the
    * candidate-rate bound (candidates / all pairs) is directly testable.
    */
  def neardupCandidates(e: DataFrame,
      nTables: Int, bitsPerTable: Int): DataFrame = {
    val b = withBuckets(e.select(col("vec_id"), col("vec")), nTables, bitsPerTable)
      .select(col("t"), col("bucket"), col("vec_id"))
    b.select(col("t"), col("bucket"), col("vec_id").as("id1"))
      .join(b.select(col("t"), col("bucket"), col("vec_id").as("id2")),
        Seq("t", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  private val normCte =
    """norms AS (SELECT vec_id, sqrt(SUM(CAST(embedding[i.range] AS DOUBLE)
      |    * CAST(embedding[i.range] AS DOUBLE))) AS norm
      |  FROM embeddings, range(1,65) i GROUP BY vec_id)""".stripMargin

  /** PQ encode + ADC shortlist — the approximate half of q139, shared so
    * the recall spec can compare soft-assignment widths on one code
    * path. `quant` carries (vec_id, qv: array<bigint>) milli-quantized
    * 64-dim vectors; 8 subspaces of 8 dims each get a 32-entry codebook
    * seeded from the `vec_id < 32` corpus vectors. Every subvector keeps
    * its `probes` nearest codebook entries (1 = classic PQ, 2 = the
    * shipped multi-probe ADC) and the ADC estimate takes the per-
    * subspace MIN over the probed entries before summing. The ESTIMATE
    * can only tighten as `probes` grows; RECALL does not always follow:
    * on separated clusters (inter-cluster distance >> quantization
    * error) multi-probe recall is >= single-assignment — the regime the
    * trade is for — but when the shortlist must order near-tied
    * neighbors, min-of-k COMPRESSES the noise floor and can reorder
    * ties either way. Both regimes are measured and pinned in
    * RetrievalOpsSpec on planted corpora (and q139's own near-
    * orthogonal synthetic corpus sits in the tied regime: 4/15 at both
    * settings, 1/15 at probes=3). Returns the top-`k` shortlist per query:
    * (qid, vec_id, approx_d2, ark). Plan shape: codebook and per-query
    * ADC tables broadcast; the corpus encodes in one narrow pass and is
    * never shuffled before the per-(query, vec) partial-sum aggregate.
    */
  def pqShortlist(quant: DataFrame, queryIds: Seq[Long], probes: Int,
      k: Int): DataFrame = {
    val sub = quant.select(col("vec_id"),
        explode(sequence(lit(0), lit(7))).as("m"), col("qv"))
      .select(col("vec_id"), col("m"),
        expr("slice(qv, m * 8 + 1, 8)").as("sv"))
    val codebook = sub.filter(col("vec_id") < 32)
      .select(col("vec_id").as("cid"), col("m").as("cm"), col("sv").as("cv"))
    val sq = "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)), " +
      "0L, (acc, x) -> acc + x)"
    val dists = sub.join(codebook, col("m") === col("cm"))
      .select(col("vec_id"), col("m"), col("cid"), expr(sq).as("d2"))
    val codes = dists.withColumn("crk", row_number().over(
        Window.partitionBy("vec_id", "m").orderBy(col("d2"), col("cid"))))
      .filter(col("crk") <= probes)
      .select(col("vec_id"), col("m"), col("cid").as("code"))
    val adc = dists.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("m").as("am"),
        col("cid").as("acid"), col("d2"))
    val approx = codes.join(adc,
        col("m") === col("am") && col("code") === col("acid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id", "m").agg(min("d2").as("md2"))
      .groupBy("qid", "vec_id").agg(sum("md2").as("approx_d2"))
    approx.withColumn("ark", row_number().over(
        Window.partitionBy("qid").orderBy(col("approx_d2"), col("vec_id"))))
      .filter(col("ark") <= k)
  }

  def qs: Seq[Q] = Seq(

    // ---- brute-force cosine top-k (ANN correctness baseline).
    // Spread ONLY the corpus side: the query side is re-derived from the
    // raw scan with its selective filter applied first, so the 20-row
    // broadcast build never pays the corpus repartition (the filter would
    // otherwise be pushed BELOW the inserted exchange — see Spread scaladoc). ----
    Q("q45_cosine_topk",
      (s, d) => {
        val raw = Tables.embeddings(s, d)
        val corpus = withNorm(graft.operators.Spread.byKey(raw, col("vec_id")))
        cosineTopK(withNorm(raw.filter(col("vec_id") < 20)), corpus, 5)
          .orderBy("qid", "rk")
      },
      Some(s"""WITH $normCte,
              |dots AS (SELECT q.vec_id AS qid, e.vec_id AS vid,
              |  SUM(CAST(q.embedding[i.range] AS DOUBLE) * CAST(e.embedding[i.range] AS DOUBLE)) AS dot
              |  FROM embeddings q, embeddings e, range(1,65) i
              |  WHERE q.vec_id < 20
              |  GROUP BY q.vec_id, e.vec_id),
              |scored AS (SELECT qid, vid AS vec_id,
              |  round(dot / (nq.norm * ne.norm), 6) AS cosine
              |  FROM dots JOIN norms nq ON nq.vec_id = qid
              |  JOIN norms ne ON ne.vec_id = vid)
              |SELECT qid, vec_id, cosine,
              |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS INT) AS rk
              |FROM scored
              |QUALIFY rk <= 5
              |ORDER BY qid, rk""".stripMargin),
      "pipeline-op: brute-force cosine top-k (zip_with/aggregate dot product)"),

    // ---- embedding-cosine near-duplicate pairs (LSH-bucketed candidates,
    // exact scoring; oracle below is the exact all-pairs form over the
    // SAME constructed corpus). The harness embeddings are near-orthogonal
    // random vectors (max natural pairwise cosine ~ 0.46), so a realistic
    // near-dup threshold would match nothing; the corpus therefore PLANTS
    // one deterministic near-duplicate per base vector — every dimension
    // scaled by 1.1 (even 0-based dims) or 0.9 (odd dims), giving cosine
    // ~ 0.995 against its source for any input vector (the perturbation is
    // ~orthogonal to the vector, so cos ~ 1/sqrt(1.01)) while leaving
    // cross pairs far below threshold. Both engines build the planted set
    // with the same double arithmetic, so the exact oracle still applies.
    // The vec_id scope is applied BEFORE anything else so the tiny
    // filtered input pays no exchange (the corpus-scale pipeline shape is
    // identical, just without the scope filter). ----
    Q("q44_embedding_neardup",
      (s, d) => {
        val e = withNorm(withPlantedDups(
          Tables.embeddings(s, d).filter(col("vec_id") < 300)))
        neardupPairs(e, 0.8).orderBy("id1", "id2")
      },
      Some("""WITH cells AS (
              |  SELECT vec_id, i.range AS i, CAST(embedding[i.range] AS DOUBLE) AS x
              |  FROM embeddings, range(1,65) i WHERE vec_id < 300
              |  UNION ALL
              |  SELECT vec_id + 100000, i.range, CAST(embedding[i.range] AS DOUBLE)
              |    * (CASE WHEN (i.range - 1) % 2 = 0 THEN 1.1 ELSE 0.9 END)
              |  FROM embeddings, range(1,65) i WHERE vec_id < 300),
              |norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS norm
              |  FROM cells GROUP BY vec_id),
              |dots AS (SELECT a.vec_id AS id1, b.vec_id AS id2, SUM(a.x * b.x) AS dot
              |  FROM cells a JOIN cells b ON a.i = b.i AND a.vec_id < b.vec_id
              |  GROUP BY a.vec_id, b.vec_id)
              |SELECT id1, id2, round(dot / (n1.norm * n2.norm), 6) AS cosine
              |FROM dots JOIN norms n1 ON n1.vec_id = id1
              |JOIN norms n2 ON n2.vec_id = id2
              |WHERE round(dot / (n1.norm * n2.norm), 6) >= 0.8
              |ORDER BY id1, id2""".stripMargin),
      "pipeline-op: embedding-cosine near-dup pair detection (planted dups)"),

    // ---- semantic decontamination: flag corpus vectors whose cosine
    // against ANY eval-set embedding crosses the threshold — the
    // embedding-space complement of q90's n-gram decontamination
    // (catches paraphrases and re-encodings that share no 5-gram). The
    // eval set is FIXED-SIZE by construction (benchmarks don't grow
    // with the corpus — scoped here to 20 planted paraphrases of
    // vec_id % 25 == 0 && < 500, built with q44's deterministic
    // 1.1/0.9 perturbation at cosine ~0.995), so it always broadcasts
    // and the corpus is scanned once, never shuffled: the same
    // broadcast-the-small-side shape as q45 at any scale. Natural
    // cross-pairs top out near 0.5 on this corpus, so the 0.9
    // threshold separates cleanly. ----
    Q("q129_semantic_decontam",
      (s, d) => {
        val raw = Tables.embeddings(s, d)
        val ev = withNorm(raw
          .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
          .select((col("vec_id") + 100000L).as("vec_id"),
            perturbDup(col("embedding")).as("embedding")))
          .select(col("vec_id").as("eval_id"), col("vec").as("evec"),
            col("norm").as("enorm"))
        val corpus = withNorm(graft.operators.Spread.byKey(raw, col("vec_id")))
        corpus.join(broadcast(ev))
          .withColumn("cosine", round(dot(col("evec"), col("vec")) /
            (col("enorm") * col("norm")), 6))
          .filter(col("cosine") >= 0.9)
          .select(col("vec_id"), col("eval_id"), col("cosine"))
          .orderBy("vec_id", "eval_id")
      },
      Some("""WITH ev AS (
             |  SELECT vec_id + 100000 AS eval_id, i.range AS i,
             |    CAST(embedding[i.range] AS DOUBLE)
             |      * (CASE WHEN (i.range - 1) % 2 = 0 THEN 1.1 ELSE 0.9 END) AS x
             |  FROM embeddings, range(1,65) i
             |  WHERE vec_id % 25 = 0 AND vec_id < 500),
             |enorms AS (SELECT eval_id, sqrt(SUM(x * x)) AS enorm
             |  FROM ev GROUP BY eval_id),
             |cnorms AS (SELECT vec_id, sqrt(SUM(CAST(embedding[i.range] AS DOUBLE)
             |    * CAST(embedding[i.range] AS DOUBLE))) AS norm
             |  FROM embeddings, range(1,65) i GROUP BY vec_id),
             |dots AS (SELECT e.vec_id, ev.eval_id,
             |    SUM(CAST(e.embedding[ev.i] AS DOUBLE) * ev.x) AS dot
             |  FROM embeddings e, ev
             |  GROUP BY e.vec_id, ev.eval_id)
             |SELECT vec_id, eval_id,
             |  round(dot / (enorm * norm), 6) AS cosine
             |FROM dots JOIN enorms USING (eval_id) JOIN cnorms USING (vec_id)
             |WHERE round(dot / (enorm * norm), 6) >= 0.9
             |ORDER BY vec_id, eval_id""".stripMargin),
      "pipeline-op: embedding-space eval decontamination (broadcast eval side)"),

    // ---- LSH-bucketed ANN (scale path; recall validated in tests).
    // Full oracle: the md5-parity planes are deterministic and
    // SQL-expressible — weight(t,b,dim) = +1 iff the first byte of
    // md5("t:b:dim") is even, i.e. iff the digest's SECOND hex nibble is
    // even (the low bit of a byte lives in its low nibble). DuckDB
    // recomputes the identical buckets, candidate join and exact scoring,
    // so the compare is a full row/schema/hash match, not rows-only. ----
    Q("q46_ann_lsh",
      (s, d) => {
        val raw = Tables.embeddings(s, d)
        val corpus = withNorm(graft.operators.Spread.byKey(raw, col("vec_id")))
        lshTopK(withNorm(raw.filter(col("vec_id") < 20)), corpus, 5)
          .orderBy("qid", "rk")
      },
      Some(s"""WITH $normCte,
              |planes AS (SELECT t.range AS t, b.range AS b, d.range AS d,
              |  CASE WHEN (instr('0123456789abcdef', substr(
              |      md5(t.range || ':' || b.range || ':' || (d.range - 1)), 2, 1)) - 1)
              |      % 2 = 0
              |    THEN 1.0 ELSE -1.0 END AS w
              |  FROM range(0,4) t, range(0,4) b, range(1,65) d),
              |bitdots AS (SELECT e.vec_id, p.t, p.b,
              |    SUM(CAST(e.embedding[p.d] AS DOUBLE) * p.w) AS dot
              |  FROM embeddings e, planes p
              |  GROUP BY e.vec_id, p.t, p.b),
              |buckets AS (SELECT vec_id, t,
              |    CAST(SUM(CASE WHEN dot > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS bucket
              |  FROM bitdots GROUP BY vec_id, t),
              |cand AS (SELECT DISTINCT qb.vec_id AS qid, bb.vec_id
              |  FROM buckets qb JOIN buckets bb
              |    ON qb.t = bb.t AND qb.bucket = bb.bucket
              |  WHERE qb.vec_id < 20),
              |dots AS (SELECT qid, cand.vec_id,
              |    SUM(CAST(q.embedding[i.range] AS DOUBLE)
              |      * CAST(e.embedding[i.range] AS DOUBLE)) AS dot
              |  FROM cand JOIN embeddings q ON q.vec_id = qid
              |  JOIN embeddings e ON e.vec_id = cand.vec_id, range(1,65) i
              |  GROUP BY qid, cand.vec_id),
              |scored AS (SELECT qid, dots.vec_id,
              |    round(dot / (nq.norm * ne.norm), 6) AS cosine
              |  FROM dots JOIN norms nq ON nq.vec_id = qid
              |  JOIN norms ne ON ne.vec_id = dots.vec_id)
              |SELECT qid, vec_id, cosine,
              |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS INT) AS rk
              |FROM scored
              |QUALIFY rk <= 5
              |ORDER BY qid, rk""".stripMargin),
      "pipeline-op: sign-LSH bucketed approximate nearest neighbors"),

    // ---- IVF ANN: coarse-quantize into cells, probe the nearest nprobe
    // cells only. Centroids here are seed vectors (vec_id < 8) so the
    // whole operator is deterministic and SQL-expressible; at scale the
    // centroid set is a k-means result — still tiny, still broadcast.
    // Cell assignment is a narrow map (broadcast 8 centroids, argmax by
    // rounded cosine), so the scan-side cost is one pass; the candidate
    // join replaces the full cross product with |probed cells| buckets. ----
    Q("q72_ann_ivf",
      (s, d) => {
        // Spread ONLY the full-corpus side; every selectively-filtered side
        // (centroids, query vectors) re-derives from the raw scan so its
        // broadcast build skips the corpus repartition (Spread scaladoc).
        val raw = Tables.embeddings(s, d)
        val e = withNorm(graft.operators.Spread.byKey(raw, col("vec_id")))
        val queries = withNorm(raw.filter(col("vec_id") < 20))
        val cent = withNorm(raw.filter(col("vec_id") < 8))
          .select(col("vec_id").as("cid"), col("vec").as("cvec"),
            col("norm").as("cnorm"))
        // rank (vector, centroid) pairs; the identical scoring expression
        // runs over the full corpus (for cells, crk = 1) and over the tiny
        // query side (for probes, crk <= 2)
        def rankCentroids(vs: DataFrame): DataFrame = vs
          .select(col("vec_id"), col("vec"), col("norm"))
          .join(broadcast(cent))
          .withColumn("ccos", round(dot(col("vec"), col("cvec")) /
            (col("norm") * col("cnorm")), 6))
          .withColumn("crk", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))))
        val cells = rankCentroids(e).filter(col("crk") === 1)
          .select(col("vec_id"), col("cid"))
        val probes = rankCentroids(queries).filter(col("crk") <= 2)
          .select(col("vec_id").as("qid"), col("cid"))
        val candidates = cells.join(broadcast(probes), Seq("cid"))
          .select("qid", "vec_id").distinct()
        val scored = candidates
          .join(e.select(col("vec_id"), col("vec"), col("norm")), Seq("vec_id"))
          .join(broadcast(queries
            .select(col("vec_id").as("qid"), col("vec").as("qvec"),
              col("norm").as("qnorm"))), Seq("qid"))
          .withColumn("cosine", round(dot(col("qvec"), col("vec")) /
            (col("qnorm") * col("norm")), 6))
        val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("vec_id"), col("cosine"), col("rk"))
          .orderBy("qid", "rk")
      },
      Some(s"""WITH $normCte,
              |cdots AS (SELECT e.vec_id, c.vec_id AS cid,
              |  SUM(CAST(e.embedding[i.range] AS DOUBLE) * CAST(c.embedding[i.range] AS DOUBLE)) AS dot
              |  FROM embeddings e, embeddings c, range(1,65) i
              |  WHERE c.vec_id < 8
              |  GROUP BY e.vec_id, c.vec_id),
              |assign AS (SELECT cdots.vec_id, cid,
              |  ROW_NUMBER() OVER (PARTITION BY cdots.vec_id
              |    ORDER BY round(dot / (nv.norm * nc.norm), 6) DESC, cid) AS crk
              |  FROM cdots JOIN norms nv ON nv.vec_id = cdots.vec_id
              |  JOIN norms nc ON nc.vec_id = cid),
              |cells AS (SELECT vec_id, cid FROM assign WHERE crk = 1),
              |probes AS (SELECT vec_id AS qid, cid FROM assign
              |  WHERE vec_id < 20 AND crk <= 2),
              |cand AS (SELECT DISTINCT qid, cells.vec_id
              |  FROM cells JOIN probes ON cells.cid = probes.cid),
              |dots AS (SELECT qid, cand.vec_id,
              |  SUM(CAST(q.embedding[i.range] AS DOUBLE) * CAST(e.embedding[i.range] AS DOUBLE)) AS dot
              |  FROM cand JOIN embeddings q ON q.vec_id = qid
              |  JOIN embeddings e ON e.vec_id = cand.vec_id, range(1,65) i
              |  GROUP BY qid, cand.vec_id),
              |scored AS (SELECT qid, dots.vec_id,
              |  round(dot / (nq.norm * ne.norm), 6) AS cosine
              |  FROM dots JOIN norms nq ON nq.vec_id = qid
              |  JOIN norms ne ON ne.vec_id = dots.vec_id)
              |SELECT qid, vec_id, cosine,
              |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS INT) AS rk
              |FROM scored
              |QUALIFY rk <= 5
              |ORDER BY qid, rk""".stripMargin),
      "pipeline-op: IVF approximate nearest neighbors (probe nprobe=2 of 8 cells)"),

    // ---- int8 scalar quantization + two-phase retrieval: the memory-
    // bound scale pattern real vector stores use (FAISS SQ8 / Lucene
    // scalar quantization). Phase 1 scores EVERY candidate on the int8
    // codes — 4x smaller than float32, and the dot product is exact
    // int64 arithmetic, so the approximate scores are bit-identical on
    // any engine and any partial-sum order (no float reduction in the
    // wide scan at all). Phase 2 re-scores only the per-query top-8
    // shortlist at full precision. Quantization is per-vector symmetric:
    // q_i = floor(x_i / s + 0.5) with s = max|x| / 127 (floor(+0.5), not
    // round(): identical halfway behavior everywhere). At 100 TB phase 1
    // is the only full-corpus pass and it reads a quarter of the bytes;
    // phase 2 touches 8 rows per query. ----
    Q("q95_quantized_rescore",
      (s, d) => {
        val raw = Tables.embeddings(s, d)
        def quant(df: DataFrame): DataFrame = df
          .withColumn("scale", array_max(transform(col("vec"), x => abs(x))) / 127d)
          .withColumn("qvec", transform(col("vec"),
            x => floor(x / col("scale") + 0.5d).cast("long")))
        val corpus = quant(withNorm(graft.operators.Spread.byKey(raw, col("vec_id"))))
        val queries = quant(withNorm(raw.filter(col("vec_id") < 20)))
          .select(col("vec_id").as("qid"), col("qvec").as("q_qvec"),
            col("scale").as("q_scale"), col("vec").as("q_vec"),
            col("norm").as("q_norm"))
        val idot = aggregate(zip_with(col("q_qvec"), col("qvec"),
          (a, b) => a * b), lit(0L), (acc, x) => acc + x)
        val approx = corpus.join(broadcast(queries))
          .withColumn("approx_cosine", round(col("q_scale") * col("scale")
            * idot.cast("double") / (col("q_norm") * col("norm")), 6))
        val w1 = Window.partitionBy("qid")
          .orderBy(col("approx_cosine").desc, col("vec_id"))
        val shortlist = approx.withColumn("ark", row_number().over(w1))
          .filter(col("ark") <= 8)
          .select(col("qid"), col("vec_id"), col("approx_cosine"),
            col("q_vec"), col("q_norm"))
        val exact = shortlist
          .join(withNorm(raw).select(col("vec_id"), col("vec"), col("norm")),
            Seq("vec_id"))
          .withColumn("cosine",
            round(dot(col("q_vec"), col("vec")) / (col("q_norm") * col("norm")), 6))
        val w2 = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
        exact.withColumn("rk", row_number().over(w2))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("vec_id"), col("cosine"),
            col("approx_cosine"), col("rk"))
          .orderBy("qid", "rk")
      },
      Some(s"""WITH $normCte,
              |cells AS (SELECT vec_id, i.range AS i,
              |    CAST(embedding[i.range] AS DOUBLE) AS x
              |  FROM embeddings, range(1,65) i),
              |scales AS (SELECT vec_id, MAX(abs(x)) / 127 AS s
              |  FROM cells GROUP BY vec_id),
              |qcells AS (SELECT c.vec_id, i,
              |    CAST(floor(x / s + 0.5) AS BIGINT) AS qx
              |  FROM cells c JOIN scales USING (vec_id)),
              |idots AS (SELECT q.vec_id AS qid, c.vec_id, SUM(q.qx * c.qx) AS idot
              |  FROM qcells q JOIN qcells c ON q.i = c.i
              |  WHERE q.vec_id < 20
              |  GROUP BY q.vec_id, c.vec_id),
              |approx AS (SELECT qid, idots.vec_id,
              |    round(sq.s * sc.s * CAST(idot AS DOUBLE)
              |      / (nq.norm * nc.norm), 6) AS approx_cosine
              |  FROM idots JOIN scales sq ON sq.vec_id = qid
              |  JOIN scales sc ON sc.vec_id = idots.vec_id
              |  JOIN norms nq ON nq.vec_id = qid
              |  JOIN norms nc ON nc.vec_id = idots.vec_id),
              |shortlist AS (SELECT qid, vec_id, approx_cosine,
              |    ROW_NUMBER() OVER (PARTITION BY qid
              |      ORDER BY approx_cosine DESC, vec_id) AS ark
              |  FROM approx QUALIFY ark <= 8),
              |exact AS (SELECT qid, sl.vec_id, approx_cosine,
              |    SUM(CAST(q.embedding[i.range] AS DOUBLE)
              |      * CAST(e.embedding[i.range] AS DOUBLE)) AS dot
              |  FROM shortlist sl JOIN embeddings q ON q.vec_id = qid
              |  JOIN embeddings e ON e.vec_id = sl.vec_id, range(1,65) i
              |  GROUP BY qid, sl.vec_id, approx_cosine),
              |scored AS (SELECT qid, exact.vec_id, approx_cosine,
              |    round(dot / (nq.norm * ne.norm), 6) AS cosine
              |  FROM exact JOIN norms nq ON nq.vec_id = qid
              |  JOIN norms ne ON ne.vec_id = exact.vec_id)
              |SELECT qid, vec_id, cosine, approx_cosine,
              |  CAST(ROW_NUMBER() OVER (PARTITION BY qid
              |    ORDER BY cosine DESC, vec_id) AS INT) AS rk
              |FROM scored QUALIFY rk <= 5
              |ORDER BY qid, rk""".stripMargin),
      "pipeline-op: int8 scalar quantization + exact top-5 rescore of top-8 shortlist"),

    // ---- semantic dedup via k-means clustering (SemDeDup, Abbas et al.
    // 2023, arXiv:2303.09540): cluster the corpus, then search for
    // near-duplicate pairs only WITHIN each cluster — the cluster
    // partition replaces the n^2 cross product with k independent
    // n_c^2 problems (and at real scale each cluster's pairing would
    // itself be LSH-bucketed, see q44). One full Lloyd iteration runs
    // distributed: seed centroids (vec_id < 8) assign members by argmax
    // rounded cosine (broadcast, narrow), then the centroid UPDATE is a
    // posexplode + groupBy(cid, pos) mean — 8x64 partial sums per map
    // task, so the corpus shuffles k*dims scalars, not vectors. The mean
    // is made bit-identical across engines and partial-sum orders by
    // quantizing each component to integer millionths (floor(x*1e6+0.5),
    // exact BIGINT sums) before dividing — the same integer-cents trick
    // the money columns use; a raw double mean would depend on Spark's
    // partition order. Cross-cluster near-dup pairs are MISSED by
    // construction (the documented SemDeDup recall trade-off); the spec
    // pins recovered-pair recall vs q44's exhaustive baseline. ----
    Q("q98_kmeans_semdedup",
      (s, d) => {
        val e = withNorm(withPlantedDups(
          Tables.embeddings(s, d).filter(col("vec_id") < 300)))
        def assign(cents: DataFrame): DataFrame = e
          .select(col("vec_id"), col("vec"), col("norm"))
          .join(broadcast(cents))
          .withColumn("ccos", round(dot(col("vec"), col("cvec")) /
            (col("norm") * col("cnorm")), 6))
          .withColumn("crk", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))))
          .filter(col("crk") === 1)
          .select(col("vec_id"), col("cid"))
        val seeds = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("vec").as("cvec"),
            col("norm").as("cnorm"))
        val updated = assign(seeds)
          .join(e.select(col("vec_id"), col("vec")), Seq("vec_id"))
          .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
          .groupBy("cid", "pos")
          .agg(sum(floor(col("x") * 1000000d + 0.5d)).as("sumq"),
            count(lit(1)).as("n"))
          .withColumn("cx",
            col("sumq").cast("double") / lit(1000000.0) / col("n"))
          .groupBy("cid")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
            p => p.getField("cx")).as("cvec"))
          .withColumn("cnorm",
            sqrt(aggregate(col("cvec"), lit(0.0), (acc, x) => acc + x * x)))
        val members = assign(updated).withColumnRenamed("cid", "cluster")
        members.select(col("cluster"), col("vec_id").as("id1"))
          .join(members.select(col("cluster"), col("vec_id").as("id2")),
            Seq("cluster"))
          .filter(col("id1") < col("id2"))
          .join(e.select(col("vec_id").as("id1"), col("vec").as("v1"),
            col("norm").as("n1")), Seq("id1"))
          .join(e.select(col("vec_id").as("id2"), col("vec").as("v2"),
            col("norm").as("n2")), Seq("id2"))
          .withColumn("cosine", round(dot(col("v1"), col("v2")) /
            (col("n1") * col("n2")), 6))
          .filter(col("cosine") >= 0.8)
          .select(col("cluster"), col("id1"), col("id2"), col("cosine"))
          .orderBy("id1", "id2")
      },
      Some("""WITH cells AS (
             |  SELECT vec_id, i.range AS i, CAST(embedding[i.range] AS DOUBLE) AS x
             |  FROM embeddings, range(1,65) i WHERE vec_id < 300
             |  UNION ALL
             |  SELECT vec_id + 100000, i.range, CAST(embedding[i.range] AS DOUBLE)
             |    * (CASE WHEN (i.range - 1) % 2 = 0 THEN 1.1 ELSE 0.9 END)
             |  FROM embeddings, range(1,65) i WHERE vec_id < 300),
             |norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS norm
             |  FROM cells GROUP BY vec_id),
             |seeds AS (SELECT vec_id AS cid, i, x FROM cells WHERE vec_id < 8),
             |d0 AS (SELECT c.vec_id, s.cid, SUM(c.x * s.x) AS dot
             |  FROM cells c JOIN seeds s ON s.i = c.i GROUP BY c.vec_id, s.cid),
             |a0 AS (SELECT d0.vec_id, cid, ROW_NUMBER() OVER (
             |    PARTITION BY d0.vec_id
             |    ORDER BY round(dot / (nv.norm * nc.norm), 6) DESC, cid) AS crk
             |  FROM d0 JOIN norms nv ON nv.vec_id = d0.vec_id
             |  JOIN norms nc ON nc.vec_id = cid),
             |m0 AS (SELECT vec_id, cid FROM a0 WHERE crk = 1),
             |cent AS (SELECT cid, i,
             |    CAST(SUM(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             |      / 1000000.0 / COUNT(*) AS x
             |  FROM m0 JOIN cells USING (vec_id) GROUP BY cid, i),
             |cnorms AS (SELECT cid, sqrt(SUM(x * x)) AS cnorm
             |  FROM cent GROUP BY cid),
             |d1 AS (SELECT c.vec_id, cent.cid, SUM(c.x * cent.x) AS dot
             |  FROM cells c JOIN cent ON cent.i = c.i GROUP BY c.vec_id, cent.cid),
             |a1 AS (SELECT d1.vec_id, d1.cid, ROW_NUMBER() OVER (
             |    PARTITION BY d1.vec_id
             |    ORDER BY round(dot / (nv.norm * cn.cnorm), 6) DESC, d1.cid) AS crk
             |  FROM d1 JOIN norms nv ON nv.vec_id = d1.vec_id
             |  JOIN cnorms cn ON cn.cid = d1.cid),
             |m1 AS (SELECT vec_id, cid AS cluster FROM a1 WHERE crk = 1),
             |pairs AS (SELECT x.cluster, x.vec_id AS id1, y.vec_id AS id2
             |  FROM m1 x JOIN m1 y
             |    ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
             |pdots AS (SELECT p.cluster, p.id1, p.id2, SUM(a.x * b.x) AS dot
             |  FROM pairs p JOIN cells a ON a.vec_id = p.id1
             |  JOIN cells b ON b.vec_id = p.id2 AND b.i = a.i
             |  GROUP BY p.cluster, p.id1, p.id2)
             |SELECT cluster, id1, id2,
             |  round(dot / (n1.norm * n2.norm), 6) AS cosine
             |FROM pdots JOIN norms n1 ON n1.vec_id = id1
             |JOIN norms n2 ON n2.vec_id = id2
             |WHERE round(dot / (n1.norm * n2.norm), 6) >= 0.8
             |ORDER BY id1, id2""".stripMargin),
      "pipeline-op: SemDeDup — k-means clustering + within-cluster near-dup pairs"),

    // ---- chunk -> document embedding aggregation: mean-pool each
    // 10-chunk group into one document vector (the standard long-doc
    // embedding recipe), then score the pooled vector against the
    // group's first chunk. The pooling aggregate shuffles (group, dim)
    // SCALAR partials — k*dims values regardless of corpus size, the
    // same shape as q98's centroid update — and the mean is made
    // bit-identical across engines/partition orders by the integer-
    // millionths quantization trick (floor(x*1e6+0.5) summed as
    // BIGINT before the divide). ----
    Q("q115_meanpool_embeddings",
      (s, d) => {
        val cells = graft.operators.Spread.byKey(
            Tables.embeddings(s, d), col("vec_id"))
          .select(col("vec_id"), expr("vec_id DIV 10").as("grp"),
            posexplode(transform(col("embedding"), x => x.cast("double")))
              .as(Seq("pos", "x")))
          .select(col("vec_id"), col("grp"), (col("pos") + 1).as("i"), col("x"))
        val pooled = cells.groupBy("grp", "i")
          .agg((sum(floor(col("x") * 1000000d + 0.5d).cast("long"))
            .cast("double") / lit(1000000.0) / count(lit(1))).as("p"))
        val pnorm = pooled.groupBy("grp")
          .agg(sqrt(sum(col("p") * col("p"))).as("pn"))
        val firstChunk = cells.filter(col("vec_id") % 10 === 0)
          .select(col("grp"), col("i"), col("x"))
        val fnorm = firstChunk.groupBy("grp")
          .agg(sqrt(sum(col("x") * col("x"))).as("fn"))
        pooled.join(firstChunk, Seq("grp", "i"))
          .groupBy("grp").agg(sum(col("p") * col("x")).as("dot"))
          .join(pnorm, Seq("grp")).join(fnorm, Seq("grp"))
          .select(col("grp"),
            round(col("dot") / (col("pn") * col("fn")), 6).as("cos_first"),
            round(col("pn"), 6).as("pooled_norm"))
          .orderBy("grp")
      },
      Some("""WITH cells AS (SELECT vec_id, vec_id // 10 AS grp,
             |    i.range AS i, CAST(embedding[i.range] AS DOUBLE) AS x
             |  FROM embeddings, range(1,65) i),
             |pooled AS (SELECT grp, i,
             |    CAST(SUM(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             |      / 1000000.0 / COUNT(*) AS p
             |  FROM cells GROUP BY grp, i),
             |pnorm AS (SELECT grp, sqrt(SUM(p * p)) AS pn
             |  FROM pooled GROUP BY grp),
             |first_chunk AS (SELECT grp, i, x FROM cells WHERE vec_id % 10 = 0),
             |fnorm AS (SELECT grp, sqrt(SUM(x * x)) AS fn
             |  FROM first_chunk GROUP BY grp),
             |dots AS (SELECT p.grp, SUM(p.p * f.x) AS dot
             |  FROM pooled p JOIN first_chunk f ON p.grp = f.grp AND p.i = f.i
             |  GROUP BY p.grp)
             |SELECT grp, round(dot / (pn * fn), 6) AS cos_first,
             |  round(pn, 6) AS pooled_norm
             |FROM dots JOIN pnorm USING (grp) JOIN fnorm USING (grp)
             |ORDER BY grp""".stripMargin),
      "pipeline-op: chunk->doc mean-pool embedding aggregation (quantized mean)"),

    // ---- product quantization ANN (PQ, Jégou et al. 2011): split each
    // 64-dim vector into 8 subspaces of 8 dims, code every subvector as
    // its nearest of 32 codebook centroids (corpus-seeded, cf. q98's
    // seeding), and answer queries via ADC — the query precomputes an
    // 8x32 table of subspace distances, so scoring a corpus vector is 8
    // table lookups + adds on its 5-byte code instead of 64 floats:
    // the memory-bound trick that fits billion-vector indexes in RAM.
    // MULTI-ASSIGNMENT (multi-probe ADC): each subvector keeps its TWO
    // nearest codebook entries (10-byte code instead of 5), and the ADC
    // estimate takes the min of the two table entries per subspace
    // before summing — the distance ESTIMATE only tightens for 2x code
    // bytes and 2x lookup fan-out. Shortlist recall follows on
    // separated clusters (pinned in RetrievalOpsSpec), but on near-tied
    // candidates min-of-k compresses the noise floor and can reorder
    // ties — see [[pqShortlist]] for the measured trade.
    // Plan shape: the codebook (256 rows) and ADC tables (8x32 per query)
    // broadcast unhinted; the corpus encodes in one narrow pass
    // (map-side top-2-by over 8 candidates, no corpus shuffle before the
    // per-(query, vec) partial-sum aggregate); exact rescore touches
    // only the top-8 shortlist. All arithmetic is exact BIGINT on
    // milli-quantized components (floor(x*1000+0.5)) — argmin ties
    // break by centroid id, so codes, ADC sums, and both rank columns
    // hash-match the oracle bit-for-bit. SimilaritySpec pins shortlist
    // recall vs the exact-scan baseline. ----
    Q("q139_pq_ann",
      (s, d) => {
        val quant = Tables.embeddings(s, d).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
            .as("qv"))
        val shortlist = pqShortlist(quant, Seq(11L, 222L, 333L),
          probes = 2, k = 8)
        val qv = quant.select(col("vec_id").as("qid"), col("qv").as("qqv"))
        val fullSq = "aggregate(zip_with(qqv, qv, (a, b) -> (a - b) * (a - b)), " +
          "0L, (acc, x) -> acc + x)"
        shortlist.join(qv, "qid").join(quant, "vec_id")
          .select(col("qid"), col("vec_id"), col("approx_d2"),
            expr(fullSq).as("exact_d2"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("qid").orderBy(col("exact_d2"), col("vec_id")))
            .cast("int"))
          .filter(col("rk") <= 5)
          .orderBy(col("qid"), col("rk"))
      },
      Some("""WITH quant AS (
        |  SELECT vec_id,
        |    [CAST(floor(x * 1000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings),
        |sub AS (
        |  SELECT vec_id, m.m AS m, qv[m.m * 8 + 1 : m.m * 8 + 8] AS sv
        |  FROM quant, (SELECT range AS m FROM range(0, 8)) m),
        |codebook AS (
        |  SELECT vec_id AS cid, m, sv AS cv FROM sub WHERE vec_id < 32),
        |dists AS (
        |  SELECT s.vec_id, s.m, c.cid,
        |    list_sum([ (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])
        |               FOR i IN range(1, 9) ]) AS d2
        |  FROM sub s JOIN codebook c ON s.m = c.m),
        |codes AS (
        |  SELECT vec_id, m, cid AS code FROM (
        |    SELECT vec_id, m, cid,
        |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
        |    FROM dists) WHERE rn <= 2),
        |adc AS (
        |  SELECT vec_id AS qid, m, cid, d2 FROM dists
        |  WHERE vec_id IN (11, 222, 333)),
        |approx AS (
        |  SELECT qid, vec_id, CAST(SUM(md2) AS BIGINT) AS approx_d2 FROM (
        |    SELECT a.qid, co.vec_id, co.m, MIN(a.d2) AS md2
        |    FROM codes co JOIN adc a ON a.m = co.m AND a.cid = co.code
        |    WHERE co.vec_id <> a.qid
        |    GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2),
        |shortlist AS (
        |  SELECT qid, vec_id, approx_d2,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY approx_d2, vec_id) AS ark
        |  FROM approx QUALIFY ark <= 8),
        |exact AS (
        |  SELECT sl.qid, sl.vec_id, sl.approx_d2,
        |    CAST(list_sum([ (q.qv[i] - e.qv[i]) * (q.qv[i] - e.qv[i])
        |                    FOR i IN range(1, 65) ]) AS BIGINT) AS exact_d2
        |  FROM shortlist sl JOIN quant q ON q.vec_id = sl.qid
        |  JOIN quant e ON e.vec_id = sl.vec_id)
        |SELECT qid, vec_id, approx_d2, exact_d2,
        |  CAST(row_number() OVER (PARTITION BY qid
        |    ORDER BY exact_d2, vec_id) AS INT) AS rk
        |FROM exact QUALIFY rk <= 5
        |ORDER BY qid, rk""".stripMargin),
      "pipeline-op: product-quantization ANN (8 sub-codes of 32, ADC scan, exact rescore)")
  )
}
