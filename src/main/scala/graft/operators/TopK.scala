package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k per group as a bounded-buffer aggregation (no per-group sort of
  * the full table).
  *
  * Map-side partial aggregation shrinks each group to one k-entry buffer
  * row per map task before the shuffle, so the exchange moves
  * O(|groups| × tasks) buffer rows, never the table.
  *
  * Honesty note, measured (Microbench "topk" variants, sf0.1): on Spark
  * 3.5+/4.x the window form (`row_number().over(partitionBy(g)
  * .orderBy(v)) <= k`) is NOT the naive shuffle-everything plan the
  * classic advice assumes — `InferWindowGroupLimit` inserts a
  * `WindowGroupLimitExec` below the exchange that prunes each map task's
  * output to k rows per group, so BOTH forms shuffle O(k × |groups|)
  * rows (lineitem ~1k groups, k=3: this form 1,000 shuffle rows / 72 KiB,
  * window 3,000 rows / 48 KiB — fewer rows here, comparable bytes), and
  * the codegen'd window wins wall-clock at sf0.1 (0.8s vs 1.1s — the
  * typed Aggregator pays Catalyst↔JVM encoder conversion per row).
  * Prefer the window form for plain batch top-k. This operator remains
  * the right tool where the window form is unavailable or wasteful:
  * Structured Streaming aggregations (rank-like window functions are
  * unsupported on streaming frames; an Aggregator in `groupBy.agg` is
  * fine), and consumers that want the per-group ARRAY without re-grouping
  * (finish() emits the sorted buffer directly). It also demonstrates the
  * supported-surface custom-operator rung (typed Aggregator + partial/
  * final split) of the custom-op ladder.
  */
object TopK {

  final case class Entry(value: Double, id: Long)
  /** named product wrapper so the bounded buffer has a Catalyst encoder */
  final case class Wrap(entries: Seq[Entry])

  /** DataFrame-level top-k per group: returns (group, value, id, rk). */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val ds = df.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("double").as("value"), col(idCol).cast("long").as("id"))
      .as[(String, Double, Long)]
    val agg = new Aggregator[(String, Double, Long), Wrap, Wrap] {
      private def order(e: Entry): (Double, Long) = (-e.value, e.id)
      private def trim(s: Seq[Entry]): Seq[Entry] = s.sortBy(order).take(k)
      override def zero: Wrap = Wrap(Seq.empty)
      // Deferred trim: append until the buffer holds 2k entries, then sort
      // once and keep the best k — one O(k log k) sort per k appends
      // (amortized O(log k)/row) instead of re-sorting the whole buffer on
      // EVERY row. Discarding down to the best k seen is lossless: the k
      // survivors dominate everything dropped, so no dropped entry can
      // reappear in the final top-k.
      override def reduce(b: Wrap, x: (String, Double, Long)): Wrap = {
        val grown = b.entries :+ Entry(x._2, x._3)
        Wrap(if (grown.size >= 2 * k) trim(grown) else grown)
      }
      override def merge(a: Wrap, b: Wrap): Wrap = Wrap(trim(a.entries ++ b.entries))
      // the buffer is unsorted between deferred trims — sort exactly once
      // here so downstream posexplode order IS the rank
      override def finish(r: Wrap): Wrap = Wrap(trim(r.entries))
      override def bufferEncoder: Encoder[Wrap] = Encoders.product[Wrap]
      override def outputEncoder: Encoder[Wrap] = Encoders.product[Wrap]
    }
    ds.groupByKey(_._1)
      .agg(agg.toColumn.name("top"))
      .toDF("g", "top")
      .select(col("g").as(groupCol), posexplode(col("top.entries")).as(Seq("pos", "e")))
      .select(col(groupCol), col("e.value").as(valueCol), col("e.id").as(idCol),
        (col("pos") + 1).cast("int").as("rk"))
  }
}
