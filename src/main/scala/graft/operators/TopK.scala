package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k per group WITHOUT a global per-group sort.
  *
  * The window form (`row_number().over(partitionBy(g).orderBy(v)) <= k`)
  * shuffles every row of every group and sorts each partition. This form
  * keeps a bounded k-element buffer as an aggregation state, so map-side
  * partial aggregation shrinks each group to k rows BEFORE the shuffle —
  * at 100 TB that's the difference between shuffling the table and
  * shuffling k×|groups| rows. This is the "custom operator" answer built
  * from supported surface (Aggregator + partial agg) instead of a custom
  * SparkPlan: Catalyst already provides the partial/final split.
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
