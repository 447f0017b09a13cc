package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch: fixed-memory frequency estimation ("novel sketch"
  * slot of the custom-operator mandate). depth×width counter matrix;
  * update adds 1 to one bucket per row; estimate = min over rows.
  *
  * The bucket function is the portable md5-nibble trick (q43 SimHash):
  * identical hex in JVM and DuckDB, so the ORACLE REBUILDS THE SKETCH in
  * SQL and the comparison is exact even when buckets collide — the sketch
  * itself is cross-engine verified, not just its happy path.
  *
  * State is one Array[Long](depth*width) per partition (an
  * Aggregator ≅ TypedImperativeAggregate with Catalyst-encoded state):
  * map-side combine reduces each partition to 192 counters before the
  * 1-row shuffle, however many rows flow in — the fixed-memory shape that
  * replaces exact GROUP BY counts when cardinality explodes.
  */
object CountMinOps {

  val Depth = 3
  val Width = 64

  // reduce() calls bucket() Depth times PER INPUT ROW — the map-side
  // combine hot path — so the digest instance is thread-local and
  // reused (digest() resets state); a getInstance per call is a
  // provider lookup + allocation multiplied by every row that flows in
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 hex nibbles of "d:v" mod width — portable across engines. */
  def bucket(d: Int, v: String, width: Int = Width): Int = {
    val hex = mdLocal.get().digest(s"$d:$v".getBytes("UTF-8"))
    val h16 = ((hex(0) & 0xff) << 8) | (hex(1) & 0xff)
    h16 % width
  }

  final case class Sketch(m: Array[Long])

  /** depth×width Count-Min as a typed Aggregator (parameterized so specs
    * can force collisions with a tiny width).
    */
  def sketchAggOf(depth: Int, width: Int): Aggregator[String, Sketch, Seq[Long]] =
    new Aggregator[String, Sketch, Seq[Long]] {
      override def zero: Sketch = Sketch(Array.ofDim[Long](depth * width))
      override def reduce(b: Sketch, v: String): Sketch = {
        var d = 0
        while (d < depth) { b.m(d * width + bucket(d, v, width)) += 1; d += 1 }
        b
      }
      override def merge(a: Sketch, b: Sketch): Sketch = {
        var i = 0
        while (i < a.m.length) { a.m(i) += b.m(i); i += 1 }
        a
      }
      override def finish(r: Sketch): Seq[Long] = r.m.toSeq
      override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  val sketchAgg: Aggregator[String, Sketch, Seq[Long]] = sketchAggOf(Depth, Width)

  /** Estimate for `v` from a finished sketch matrix. */
  def estimate(m: Seq[Long], v: String, depth: Int = Depth, width: Int = Width): Long =
    (0 until depth).map(d => m(d * width + bucket(d, v, width))).min

  /** The same bucket function as a Catalyst expression over a string
    * col — `width` MUST match the sketch's build width (the JVM-side
    * [[bucket]]/[[sketchAggOf]] are width-parameterized; a probe
    * hard-coded to the default width would silently index the wrong
    * cells of a custom-width sketch).
    */
  def bucketExpr(d: Int, v: Column, width: Int = Width): Column = {
    val hex = md5(concat(lit(s"$d:"), v))
    val nib = (i: Int) =>
      (instr(lit("0123456789abcdef"), substring(hex, i, 1)) - 1)
    (nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)) % width
  }

  /** SQL text of [[bucketExpr]] (valid in DuckDB and Spark SQL); same
    * width contract as [[bucketExpr]].
    */
  def bucketSql(d: Int, v: String, width: Int = Width): String = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(md5('$d:' || $v), $i, 1)) - 1)"
    s"((${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)}) % $width)"
  }

  def qs: Seq[Q] = Seq(
    Q("q80_countmin_estimate",
      (s, d) => {
        import s.implicits._
        val types = Tables.events(s, d).select(col("event_type").as[String])
        val sketch = types.select(sketchAgg.toColumn).toDF("m")
        val distinctTypes = Tables.events(s, d)
          .select(col("event_type")).distinct()
        val est = least((0 until Depth).map(dd =>
          element_at(col("m"), bucketExpr(dd, col("event_type")) + dd * Width + 1)): _*)
        distinctTypes.join(broadcast(sketch))
          .select(col("event_type"), est.as("est_n"))
          .orderBy("event_type")
      },
      Some(s"""WITH vals AS (SELECT event_type, COUNT(*) AS n FROM events
              |  GROUP BY event_type),
              |buckets AS (SELECT event_type, n, d.range AS d,
              |  CASE d.range
              |    ${(0 until Depth).map(dd =>
                     s"WHEN $dd THEN ${bucketSql(dd, "event_type")}").mkString("\n    ")}
              |  END AS b
              |  FROM vals, range(0, $Depth) d),
              |cells AS (SELECT d, b, CAST(SUM(n) AS BIGINT) AS cell
              |  FROM buckets GROUP BY d, b)
              |SELECT v.event_type, MIN(cell) AS est_n
              |FROM buckets v JOIN cells c ON v.d = c.d AND v.b = c.b
              |GROUP BY v.event_type ORDER BY v.event_type""".stripMargin),
      "custom-operator family: Count-Min sketch Aggregator, oracle rebuilds the sketch"),

    // ---- mergeable HLL sketches as DATA (Apache DataSketches via
    // Spark's hll_sketch_agg / hll_union / hll_sketch_estimate):
    // estimate the overlap between two corpus slices by inclusion-
    // exclusion over sketch estimates — NO join between the slices ever
    // runs. This is the 100 TB overlap-planning primitive: per-source /
    // per-snapshot ~4 KB sketches are computed incrementally at ingest
    // (the same mergeable-state discipline as q138's agg states), and
    // any pair's overlap is then answered from sketch algebra on the
    // driver, however large the corpora. Union is register-max, so the
    // estimate is independent of partition/merge order and the query is
    // deterministic. Correctness surfaces q54-style: exact counts
    // (engine-independent, hash-compared against DuckDB) plus
    // within-bound verdict booleans the oracle pins to true; the
    // inclusion-exclusion overlap compounds three estimate errors, so
    // its bound is wider (20% or ±5 absolute) than the per-set 5%. ----
    Q("q140_sketch_overlap",
      (s, d) => {
        val docs = Tables.documents(s, d)
        def slice(m: Int) = docs.filter(col("doc_id") % m === 0)
          .select(md5(col("text")).as("fp"))
        val a = slice(2)
        val b = slice(3)
        def side(df: org.apache.spark.sql.DataFrame, p: String) = df.agg(
          hll_sketch_agg(col("fp")).as(s"${p}_sk"),
          countDistinct(col("fp")).as(s"${p}_exact")).withColumn("k", lit(1))
        val uexact = a.union(b)
          .agg(countDistinct(col("fp")).as("u_exact")).withColumn("k", lit(1))
        val estA = hll_sketch_estimate(col("a_sk"))
        val estB = hll_sketch_estimate(col("b_sk"))
        val estU = hll_sketch_estimate(hll_union(col("a_sk"), col("b_sk")))
        val overlapExact = col("a_exact") + col("b_exact") - col("u_exact")
        side(a, "a")
          .join(broadcast(side(b, "b")), "k")
          .join(broadcast(uexact), "k")
          .select(
            col("a_exact"), col("b_exact"), col("u_exact"),
            overlapExact.as("overlap_exact"),
            (abs(estA - col("a_exact")) <= col("a_exact") * 0.05)
              .as("a_within_5pct"),
            (abs(estB - col("b_exact")) <= col("b_exact") * 0.05)
              .as("b_within_5pct"),
            (abs(estU - col("u_exact")) <= col("u_exact") * 0.05)
              .as("union_within_5pct"),
            (abs((estA + estB - estU) - overlapExact) <=
              greatest(overlapExact.cast("double") * 0.2, lit(5.0)))
              .as("overlap_within_20pct"))
      },
      Some("""WITH a AS (SELECT DISTINCT md5(text) AS fp FROM documents
             |  WHERE doc_id % 2 = 0),
             |b AS (SELECT DISTINCT md5(text) AS fp FROM documents
             |  WHERE doc_id % 3 = 0),
             |u AS (SELECT fp FROM a UNION SELECT fp FROM b)
             |SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS a_exact,
             |  CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS b_exact,
             |  CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS u_exact,
             |  CAST((SELECT COUNT(*) FROM a) + (SELECT COUNT(*) FROM b)
             |    - (SELECT COUNT(*) FROM u) AS BIGINT) AS overlap_exact,
             |  true AS a_within_5pct,
             |  true AS b_within_5pct,
             |  true AS union_within_5pct,
             |  true AS overlap_within_20pct""".stripMargin),
      "pipeline-op: corpus-overlap estimation via mergeable HLL sketches (no join)")
  )
}
