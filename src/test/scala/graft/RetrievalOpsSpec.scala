package graft

import graft.functions.{CurationOps, RetrievalOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic tests for the retrieval / corpus-statistics operators on
  * handcrafted corpora (the sf-corpus cross-check is the DuckDB oracle;
  * these pin the semantics the oracle can't explain: ranking order,
  * boundary documents, fold table).
  */
class RetrievalOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bm25: higher tf of a rare term outranks; docs without the term absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare common common common"),
      (2L, "common common common common"),
      (3L, "rare rare common common"))
      .toDF("doc_id", "text")
    val queries = Seq((1, "rare")).toDF("qid", "term")
    val out = RetrievalOps.bm25TopK(docs, queries, 5)
      .orderBy("rk").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 1L)) // tf=2 beats tf=1
    assert(out.forall(_.getDouble(2) > 0))
    assert(!out.map(_.getLong(1)).contains(2L)) // no 'rare' -> not retrieved
  }

  test("bm25: multi-term queries sum per-term scores; equal docs tie-break by id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"), // identical content -> identical score
      (3L, "alpha alpha alpha"))
      .toDF("doc_id", "text")
    val queries = Seq((7, "alpha"), (7, "beta")).toDF("qid", "term")
    val out = RetrievalOps.bm25TopK(docs, queries, 3)
      .orderBy("rk").collect()
    // docs 1/2 match both terms, doc 3 only one (idf of 'alpha' is ln(1 +
    // 0.5/3.5) — present in all docs, so worth little); ties break by id
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
    assert(out(0).getDouble(2) === out(1).getDouble(2))
  }

  test("unigram quality: all-common doc scores ratio 1.0, rare-token doc lower") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the"),
      (2L, "the zyzzyva"))
      .toDF("doc_id", "text")
    val out = RetrievalOps.unigramQuality(docs, topV = 1)
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(3) === 1.0) // common_ratio
    assert(out(1).getDouble(3) === 0.5)
    // mean freq: doc 1 = 5.0 ('the' occurs 5x); doc 2 = (5 + 1) / 2 = 3.0
    assert(out(0).getDouble(2) === 5.0)
    assert(out(1).getDouble(2) === 3.0)
  }

  test("dup ngram spans: exact copies are fully duplicated, uniques zero, short docs empty") {
    import spark.implicits._
    val eight = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$eight i j"),  // 3 8-gram positions, all shared with doc 2
      (2L, s"$eight i j"),
      (3L, "q r s t u v w x y z"), // unique 8-grams
      (4L, "too short"))           // < 8 tokens -> no grams
      .toDF("doc_id", "text")
    val out = CurationOps.dupNgramSpans(docs)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(4))).toSeq === Seq(
      (1L, 3L, 3L, 1.0), (2L, 3L, 3L, 1.0),
      (3L, 3L, 0L, 0.0), (4L, 0L, 0L, 0.0)))
    // within-doc repetition also counts as duplication
    val selfDup = CurationOps.dupNgramSpans(Seq(
      (9L, s"$eight $eight")).toDF("doc_id", "text"))
      .collect().head
    assert(selfDup.getLong(2) > 0)
  }

  test("bloom decontamination: superset of exact hits, planted leaks always flag, empty eval set flags nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    val leak = "alpha beta gamma delta epsilon"
    val corpus = Seq(
      (1L, s"intro words then $leak and a tail"), // planted 5-gram leak
      (2L, "completely unrelated clean text here today"),
      (3L, s"$leak"), // the eval snippet verbatim
      (4L, "short one")) // < 5 tokens: no probes
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val eval = Seq((100L, leak)).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val probes = CurationOps.bloomDecontaminate(corpus, eval).collect()
    // the bloom NEVER misses a real leak (no false negatives)
    assert(probes.filter(_.getAs[Boolean]("exact_hit"))
      .forall(_.getAs[Boolean]("bloom_hit")))
    // both planted docs flag on the exact side; the clean doc does not
    val exactDocs = probes.filter(_.getAs[Boolean]("exact_hit"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(exactDocs === Set(1L, 3L))
    assert(probes.count(_.getAs[Long]("doc_id") == 4L) === 0)
    // generously-sized filter on 1 gram: no false positives either
    assert(probes.filterNot(_.getAs[Boolean]("exact_hit"))
      .forall(!_.getAs[Boolean]("bloom_hit")))
    // empty eval set: probe column is constant false, nothing flags
    val none = CurationOps.bloomDecontaminate(corpus,
      eval.filter(col("doc_id") < 0L)).collect()
    assert(none.nonEmpty && none.forall(!_.getAs[Boolean]("bloom_hit")))

    // the PRODUCTION form: per-doc leaked-gram counts, no false
    // negatives (both planted docs flag, short doc absent), and the
    // plan shape the design point demands — the bloom build is a
    // SCALAR SUBQUERY (construction launches no job; the corpus side
    // is a narrow probe, not a distinct/join)
    val prod = CurationOps.bloomProbe(corpus, eval)
    val plan = prod.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("subquery"),
      s"bloom build must ride as a scalar subquery, not an eager literal:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"the production probe must not join the corpus side:\n$plan")
    val byDoc = prod.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("leaked_grams")).toMap
    assert(byDoc(1L) >= 1L && byDoc(3L) >= 1L, s"planted leaks missed: $byDoc")
    assert(byDoc(2L) === 0L)
    assert(!byDoc.contains(4L)) // < n tokens: no grams, no row
  }

  test("content-defined chunking: boundaries are content-local — an insertion re-chunks only its neighborhood") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    // deterministic 200-word doc; version B inserts one word at pos 100
    val words = (1 to 200).map(i => s"w${i * 37 % 91}")
    val a = words.mkString(" ")
    val b = (words.take(100) :+ "INSERTED").++(words.drop(100)).mkString(" ")
    val bounds = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      .select(col("doc_id"),
        CurationOps.contentChunkBounds(split(col("text"), " "), 16)
          .as("bounds"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Int](1).toVector).toMap
    val (ba, bb) = (bounds(1L), bounds(2L))
    // boundaries strictly before the edit window are IDENTICAL — a
    // stride chunker would shift every one of them
    val editAt = 100
    assert(ba.takeWhile(_ < editAt - 2) === bb.takeWhile(_ < editAt - 2))
    assert(ba.takeWhile(_ < editAt - 2).nonEmpty)
    // boundaries after the edit resync at +1 (same trailing content):
    // compare the suffix sets relative to the document END
    val tailA = ba.filter(_ > editAt + 3).map(200 - _)
    val tailB = bb.filter(_ > editAt + 4).map(201 - _)
    assert(tailA === tailB)
    assert(tailA.nonEmpty)
    // degenerate inputs: short docs are one whole chunk
    val shortStats = CurationOps.contentChunkStats(
      Seq((9L, "tiny doc")).toDF("doc_id", "text")).collect().head
    assert(shortStats.getLong(1) === 2L && shortStats.getLong(2) === 1L &&
      shortStats.getLong(3) === 2L)
  }

  test("normalizeText golden: case, accents, control chars, punctuation, whitespace") {
    import spark.implicits._
    val out = Seq(
      "Héllo,  WORLD\t!",
      "  Café-naïve RÉSUMÉ  ",
      "àâäáãå èêëé ìîíï òôöóõ ùûüú çñÿý",
      "already clean")
      .toDF("s").select(TextOps.normalizeText(col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(out(0) === "hello world")
    assert(out(1) === "cafe naive resume") // lower() first, so É -> é -> e
    assert(out(2) === "aaaaaa eeee iiii ooooo uuuu cnyy")
    assert(out(3) === "already clean")
  }

  test("normalizeText single-pass == historical two-pass (the form the oracles run) on adversarial strings and the whole corpus") {
    import spark.implicits._
    def twoPass(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(regexp_replace(
        translate(lower(c), "àâäáãåèêëéìîíïòôöóõùûüúçñÿý",
          "aaaaaaeeeeiiiiooooouuuucnyy"),
        "[^a-z0-9 ]", " "), " +", " "))
    val adversarial = Seq(
      "a!!b", "  x\t\ty  ", "a !?,. b", "", "!!!", " ", "a",
      "Café—Über…naïve", "tab\tand\nnewline\r\nmix", "a  b   c",
      "1.5e-3 = 0.0015?", "__under__score__", "ümläut ünchanged: ü")
      .toDF("s")
    val mismatch = adversarial
      .filter(TextOps.normalizeText(col("s")) =!= twoPass(col("s")))
    assert(mismatch.count() === 0,
      mismatch.collect().map(_.getString(0)).mkString("; "))
    val corpusMismatch = Tables.documents(spark, sf)
      .filter(TextOps.normalizeText(col("text")) =!= twoPass(col("text")))
    assert(corpusMismatch.count() === 0)
  }

  test("null text survives the text operators (excluded, not crashed)") {
    import spark.implicits._
    val docs = Seq((1L, Some("the quick brown fox jumps over the lazy dog")),
      (2L, None: Option[String]))
      .toDF("doc_id", "text")
    // bm25: the null doc simply can't match any term
    val bm = RetrievalOps.bm25TopK(docs, Seq((1, "fox")).toDF("qid", "term"), 5)
      .collect()
    assert(bm.map(_.getLong(1)).toSeq === Seq(1L))
    // unigram quality: null doc contributes no tokens, so no row
    assert(RetrievalOps.unigramQuality(docs).count() === 1)
    // dup spans: null doc kept in the summary with zero grams
    val spans = CurationOps.dupNgramSpans(docs)
      .orderBy("doc_id").collect()
    assert(spans.length === 2)
    assert(spans(1).getLong(1) === 0L && spans(1).getDouble(4) === 0.0)
    // normalize: null in, null out
    val n = docs.select(TextOps.normalizeText(col("text"))).collect()
    assert(n(1).isNullAt(0))
  }

  test("PQ multi-probe ADC: measured shortlist recall — >= single-assignment on separated clusters, tie-compression measured on the noise floor") {
    import spark.implicits._
    // Planted corpora, seeded noise, deterministic. The first 32 ids
    // always cover every cluster, so the corpus-seeded codebook spans
    // the structure.
    def corpus(perCluster: Int, noise: Int): Seq[(Long, Array[Long])] = {
      val rnd = new scala.util.Random(42)
      val protos = (0 until 8).map(p =>
        Array.tabulate(64)(d => 1000L * ((p * 7 + d) % 8)))
      (0L until (8L * perCluster)).map { i =>
        (i, protos((i % 8).toInt).map(_ + rnd.nextInt(2 * noise + 1) - noise))
      }
    }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def recall(vecs: Seq[(Long, Array[Long])], queries: Seq[Long],
        probes: Int): Double = {
      val byId = vecs.toMap
      val trueTop = queries.map { q =>
        q -> byId.keys.filter(_ != q).toSeq
          .sortBy(v => (d2(byId(q), byId(v)), v)).take(8).toSet
      }.toMap
      val sl = SimilarityOps
        .pqShortlist(vecs.toDF("vec_id", "qv"), queries, probes, k = 8)
        .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id"))
      sl.count { case (q, v) => trueTop(q)(v) } / (8.0 * queries.size)
    }
    // Regime 1 — separated clusters of 9: the true top-8 IS the query's
    // cluster, inter-cluster ADC distances dwarf quantization error, and
    // the per-subspace min over probed entries only tightens estimates:
    // multi-probe must not lose recall, and both forms must be
    // near-exact. This is the regime the multi-probe trade is sold for.
    val sep = corpus(perCluster = 9, noise = 300)
    val qs = Seq(40L, 51L, 62L)
    val sepSingle = recall(sep, qs, probes = 1)
    val sepMulti = recall(sep, qs, probes = 2)
    info(s"separated clusters: recall@8 probes=1 -> $sepSingle, probes=2 -> $sepMulti")
    assert(sepMulti >= sepSingle, s"multi-probe $sepMulti < single $sepSingle")
    assert(sepMulti >= 0.9, s"recall $sepMulti low on separated clusters")
    // Regime 2 — 40-way clusters where the shortlist must ORDER near-tied
    // same-cluster neighbors: ADC cannot resolve ties below quantization
    // noise, and min-of-k COMPRESSES the noise floor, so extra probes can
    // reorder near-ties and recall may go either way (measured here:
    // probes=2 below probes=1). Pinned above the 8-in-39 random-pick
    // baseline (~0.2), not above single — the honest statement of the
    // trade, mirrored in the pqShortlist scaladoc.
    val tied = corpus(perCluster = 40, noise = 300)
    val tq = Seq(40L, 101L, 202L)
    val tiedSingle = recall(tied, tq, probes = 1)
    val tiedMulti = recall(tied, tq, probes = 2)
    info(s"tie-dominated: recall@8 probes=1 -> $tiedSingle, probes=2 -> $tiedMulti")
    assert(tiedMulti >= 0.2, s"multi-probe $tiedMulti below random baseline")
  }

  test("bm25 plan: query-term joins broadcast, no shuffle of the corpus side") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val queries = Seq((1, "dup"), (2, "vector")).toDF("qid", "term")
    val phys = RetrievalOps.bm25TopK(docs, queries, 5)
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), phys)
    assert(!phys.contains("CartesianProduct"), phys)
    assert(!phys.contains("SortMergeJoin"), phys)
  }
}
