package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relationship graphs derived from the
  * relational tables.
  *
  * The reference walks relationships one submission at a time (pandas
  * merges over participant/biospecimen IDs — `File_Submission_Object
  * .py:106-147`); a 100 TB curation pipeline instead needs whole-graph
  * passes: influence scoring of the customer↔supplier network, seed
  * expansion for contamination tracing, connected components for dedup
  * clusters (q65). PageRank is the canonical iterative join-aggregate
  * workload, so it doubles as the scale proof for ANY fixed-point loop
  * here: each iteration joins the node-sized rank table to the edge
  * list (AQE broadcasts it while it fits, key-shuffles beyond) plus one
  * key-shuffle aggregate, chained as one job per iteration over a
  * once-checkpointed edge list (see [[pageRank]] for the measured
  * peak-memory trade-off against unrolling everything into one plan;
  * on a cluster the edge materialization is `checkpoint` to
  * alluxio/HDFS).
  *
  * Determinism: ranks live in integer micro-units (1e-12) and every
  * per-iteration update is `floor(ieee_double_expr + 0.5)` over exact
  * BIGINT sums — IEEE 754 ops are bit-identical across engines, so the
  * DuckDB oracle (same formula, 5 unrolled CTE iterations) matches by
  * hash, not approximately. Mass stays below 2^53 so every double cast
  * of an accumulated BIGINT is exact (GraphOpsSpec pins conservation).
  */
object GraphOps {

  /** One PageRank power-iteration step in exact micro-unit arithmetic.
    * `edgesD` carries each edge's source OUT-DEGREE inline (pre-joined
    * once at setup — round 18: the per-iteration `pr ⋈ deg ⋈ edges`
    * chain paid a node-sized deg shuffle + an extra join stage on every
    * iteration for a value that never changes), so a step is ONE join:
    * the node-sized rank table against the cached edge list.
    */
  private def step(pr: DataFrame, edgesD: DataFrame,
      n: Long): DataFrame = {
    // fresh aliases per invocation and name-based joins only: pr's
    // lineage can contain deg/edges (pr0 derives from deg; under
    // prePartition=false microbenching the first step joins them
    // directly), and df-qualified references like edges("dst") would
    // then be ambiguous — per-call aliased projections keep every
    // step self-contained regardless of how pr was produced
    val e = edgesD.select(col("src").as("node"),
      col("dst").as("edge_dst"), col("outdeg"))
    val contrib = pr.join(e, "node")
      .select(col("edge_dst").as("node"),
        floor(col("pr").cast("double") / col("outdeg") + 0.5)
          .cast("long").as("c"))
    // repartition BEFORE the aggregate: dst values arrive near-uniformly
    // scattered, so map-side partial aggregation would build a hash map
    // over ~every node per task (32 concurrent node-count maps was the
    // single biggest memory demand in the engine at sf10/8 GiB) while
    // combining almost nothing — the explicit hash exchange moves the
    // same rows the partial agg shuffled anyway, and the aggregate then
    // runs per-partition over its own key range only
    contrib.repartition(col("node"))
      .groupBy("node").agg(sum("c").as("sc"))
      .select(col("node"),
        floor(lit(1.5e11) / n + lit(0.85) * col("sc").cast("double") + 0.5)
          .cast("long").as("pr"))
  }

  /** Fixed-iteration PageRank (damping 0.85) over a directed edge list
    * `(src, dst)`. Returns `(node, pr)` with pr in micro-units.
    *
    * PRECONDITION (checked loudly): every node must have both in- and
    * out-edges — i.e. the src and dst node sets coincide, which the
    * undirected doublings this operator serves satisfy by construction.
    * The kernel rebuilds the rank table from RECEIVED contributions
    * only; on an asymmetric graph a pure source silently vanishes after
    * one step and a pure sink leaks its mass, so such graphs are
    * refused rather than answered wrongly.
    */
  def pageRank(edgesIn: DataFrame, iterations: Int,
      prePartition: Boolean = true,
      assumeSymmetric: Boolean = false): DataFrame = {
    // hash-partition the edge list by src ONCE before caching: the
    // columnar cache preserves its outputPartitioning, so every
    // iteration's rank⋈edges join reuses it and only the node-sized
    // rank side moves — measured at sf10 (~100M edges, 5 iterations,
    // Microbench q134 single-shot): 63 s / 720M shuffled rows
    // pre-partitioned vs 89 s / 1.36B unpartitioned. (The rank table
    // cannot auto-broadcast its way out: after each iteration's
    // checkpoint its LogicalRDD has no size statistics, so the join
    // plans as a shuffle either way — pinning the edge side is what
    // removes the per-iteration |E|-row exchange.)
    //
    // the out-degree is annotated by a WINDOW count over the same
    // src-partitioning the cache needs anyway (round 19 — was: cache
    // the bare edges, aggregate deg, join it back, cache AGAIN; four
    // node/edge-sized jobs and a double materialization for a column
    // the window computes inside the single cache-build pass). The
    // window's required sort rides the exchange the cache build
    // already pays; under prePartition=false the window's own
    // exchange establishes the same layout, so the flag now only
    // controls whether the exchange is explicit.
    //
    // the edge list is referenced by every iteration, so it must
    // materialize once — but as a COLUMNAR cache (persist), not a
    // localCheckpoint: the checkpoint stores deserialized row objects
    // (~100 B per edge — the sf10 graph alone outgrew the 8 GiB bench
    // heap) and a dropped block aborts the job because the lineage is
    // gone, while the compressed columnar cache packs the long columns
    // ~5x smaller (outdeg is highly repetitive per src partition) and
    // RECOMPUTES on eviction instead of dying.
    val base = if (prePartition) edgesIn.repartition(col("src"))
               else edgesIn.select(col("src"), col("dst"))
    val edgesD = base.withColumn("outdeg", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist()
    edgesD.count() // materialize eagerly, as checkpoint did
    // the node set (distinct src — shuffle-free over the src-partitioned
    // cache), checkpointed: pr0 and the node count both read it, and
    // fresh attribute ids keep the first iteration's self-join clean
    val nodes = edgesD.select(col("src").as("node")).distinct()
      .localCheckpoint()
    // one scalar to the driver (node count), as any engine's planner does
    val n = nodes.count()
    // the precondition check as ONE aggregation job (round 18: was a
    // distinct + localCheckpoint + two except-counts — four node-sized
    // actions for a boolean): a node violates iff it appears on only
    // one side, which one grouped max-per-side pass over the cached
    // edge list answers directly (map-side combine shrinks each side
    // to its node set before the exchange). Callers whose edge list is
    // symmetric BY CONSTRUCTION (an undirected doubling emits both
    // directions of every pair — q134's tradeEdges) pass
    // assumeSymmetric=true and skip the pass outright; the public
    // default keeps the loud refusal.
    if (!assumeSymmetric) {
      val asym = edgesD
        .select(col("src").as("node"), lit(1).as("s"), lit(0).as("d"))
        .unionByName(edgesD
          .select(col("dst").as("node"), lit(0).as("s"), lit(1).as("d")))
        .groupBy("node").agg(max("s").as("hs"), max("d").as("hd"))
        .filter(col("hs") === 0 || col("hd") === 0).count()
      require(asym == 0,
        s"pageRank requires every node to have both in- and out-edges " +
          s"($asym nodes violate this): the kernel rebuilds ranks from " +
          "received contributions only, so sources vanish and sinks leak " +
          "mass on asymmetric graphs — add reverse edges (undirected " +
          "doubling) or model dangling mass before calling")
    }
    var pr = nodes.select(col("node"),
      floor(lit(1.0e12) / n + 0.5).cast("long").as("pr"))
    // each iteration runs as its OWN job (the localCheckpoint is the
    // barrier), deliberately: unrolling all iterations into one
    // declarative plan is ~40% faster in isolation (110 s vs 193 s for
    // the sf10 graph, Microbench single-shot) but pins every
    // iteration's broadcast rank table and shuffle state until the end
    // of the single job — inside the full 136-query bench sweep at the
    // 8 GiB harness heap that peak OOM-killed the JVM. Chained jobs
    // bound peak memory to one iteration, which is the property that
    // matters when the engine shares a fixed heap; the checkpointed
    // rank table itself is only node-sized. (Same shape as q65's loop,
    // where the per-round driver action forces the barrier anyway.)
    for (_ <- 1 to iterations)
      pr = step(pr, edgesD, n).localCheckpoint()
    // the final pr is eagerly localCheckpoint'ed — its lineage no longer
    // references the edge cache, so release it here: Bench runs every
    // query twice (plus Microbench's extra shots) and each invocation
    // would otherwise strand a distinct cached edge list in storage
    // memory for the rest of the 136-query session
    edgesD.unpersist(blocking = false)
    pr
  }

  /** Customer↔supplier trading graph: an undirected edge per distinct
    * (customer, supplier) pair that co-occurs on an order. Nodes are
    * LONG-encoded (customer k → 2k, supplier k → 2k+1): the edge
    * checkpoint and every per-iteration shuffle then move two longs per
    * edge instead of two strings — roughly half the bytes and cheaper
    * comparisons at the ~100M-edge sf10 size, where the checkpoint
    * competes with execution memory. [[nodeLabel]] renders the display
    * id only on the 30-row output.
    */
  private[graft] def tradeEdges(s: SparkSession, d: String): DataFrame = {
    // Spread the 1-split lineitem scan before the join+distinct: the
    // broadcast join and the distinct's partial aggregate otherwise run
    // serially in the scan stage (round 19, noop-measured: 1.15 s plain
    // vs 0.80 s spread, warm). The added exchange carries two longs per
    // row; at scale the split-count gate makes it a no-op.
    val pairs = graft.operators.Spread.byKey(
        Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("l_orderkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    val cNode = col("c") * 2
    val sNode = col("s") * 2 + 1
    // union of two projections over the distinct set, deliberately: the
    // one-pass explode(array(struct,struct)) alternative measured ~1.2 s
    // SLOWER at sf0.1 (round 18 — the generator breaks codegen fusion
    // and struct-builds per row; the duplicated post-shuffle aggregate
    // is cheaper, and ReuseExchange already dedupes the shuffle itself)
    pairs.select(cNode.as("src"), sNode.as("dst"))
      .union(pairs.select(sNode.as("src"), cNode.as("dst")))
  }

  /** Long node id back to the 'C<key>' / 'S<key>' label the oracle
    * speaks. */
  private[graft] def nodeLabel(node: Column): Column =
    concat(when(node % 2 === 0, "C").otherwise("S"),
      shiftright(node, 1).cast("string"))

  /** The oracle mirror of [[pageRank]]: 5 unrolled CTE iterations of the
    * identical micro-unit formula (no recursion — a fixed iteration count
    * is plain SQL in any engine).
    */
  private def pageRankOracle(iterations: Int): String = {
    val base = """WITH pairs AS (
      |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |edges AS (
      |  SELECT 'C' || CAST(c AS VARCHAR) AS src,
      |         'S' || CAST(s AS VARCHAR) AS dst FROM pairs
      |  UNION ALL
      |  SELECT 'S' || CAST(s AS VARCHAR), 'C' || CAST(c AS VARCHAR)
      |  FROM pairs),
      |nc AS (SELECT count(*) AS n
      |  FROM (SELECT DISTINCT src FROM edges)),
      |deg AS (SELECT src AS node, count(*) AS outdeg
      |  FROM edges GROUP BY 1),
      |pr0 AS (SELECT node, CAST(floor(1.0e12 / nc.n + 0.5) AS BIGINT) AS pr
      |  FROM deg, nc)""".stripMargin
    val iters = (1 to iterations).map { k =>
      s"""c$k AS (
         |  SELECT e.dst AS node,
         |    CAST(floor(CAST(p.pr AS DOUBLE) / d.outdeg + 0.5) AS BIGINT) AS c
         |  FROM pr${k - 1} p JOIN deg d ON p.node = d.node
         |    JOIN edges e ON e.src = p.node),
         |pr$k AS (
         |  SELECT sc.node,
         |    CAST(floor(1.5e11 / nc.n + 0.85 * CAST(sc.sc AS DOUBLE) + 0.5)
         |      AS BIGINT) AS pr
         |  FROM (SELECT node, SUM(c) AS sc FROM c$k GROUP BY node) sc, nc)"""
        .stripMargin
    }
    (base +: iters).mkString(",\n") +
      s"""\nSELECT node, CAST(pr AS DOUBLE) / 1.0e12 AS pagerank
         |FROM pr$iterations ORDER BY pagerank DESC, node LIMIT 30"""
        .stripMargin
  }

  def qs: Seq[Q] = Seq(

    // ---- PageRank influence scoring of the trading network: which
    // suppliers/customers sit at the center of the order graph. 5 power
    // iterations, damping 0.85; undirected edges so no dangling mass.
    // Scale: the edge list is hash-partitioned by src ONCE and cached
    // columnar (prePartition=true — the cache preserves its
    // outputPartitioning, measured 63 s/720M shuffled rows vs 89 s/1.36B
    // unpartitioned at sf10, see pageRank scaladoc); each iteration then
    // moves only the node-sized rank table into that fixed layout — the
    // checkpointed rank side carries no size stats so it plans as a
    // shuffle, never a broadcast, and pinning the edge side is what
    // removes the per-iteration |E|-row exchange. No hints. ----
    Q("q134_pagerank",
      (s, d) => pageRank(tradeEdges(s, d), 5, assumeSymmetric = true)
        .select(nodeLabel(col("node")).as("node"),
          (col("pr").cast("double") / 1.0e12).as("pagerank"))
        .orderBy(desc("pagerank"), col("node"))
        .limit(30),
      Some(pageRankOracle(5)),
      "pipeline op: iterative graph analytics (PageRank power iteration)")
  )
}
