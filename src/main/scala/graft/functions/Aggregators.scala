package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Typed custom aggregations (the `Aggregator[IN, BUF, OUT]` tier of
  * SURVEY §2B's UDF/UDAF row). Prefer built-ins — every aggregate here
  * HAS a built-in spelling (weighted mean = sum(x*w)/sum(w)), and the
  * oracle uses it; the Aggregator exists to cover the declared custom-
  * aggregation surface with the mergeable-buffer shape that scales
  * (partial aggregation map-side, one small buffer per group per task).
  */
object Aggregators {
  final case class WAvgBuf(var wsum: Double, var wtot: Double)

  /** Weighted arithmetic mean of `x` with weight `w`; null-safe on the
    * zero-weight edge (returns NaN like 0/0, mirroring SQL sum/sum).
    */
  object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
    def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
    def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
      b.wsum += in._1 * in._2; b.wtot += in._2; b
    }
    def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf = {
      a.wsum += b.wsum; a.wtot += b.wtot; a
    }
    def finish(b: WAvgBuf): Double = b.wsum / b.wtot
    def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  final case class TopKRow(ord: Double, id: Long)
  final case class TopKBuf(items: Seq[TopKRow])

  /** Bounded top-k per group, ordered by (ord ASC, id ASC) — pass a
    * negated measure for descending. Unlike collect_list + sort (buffer
    * grows with the group) the buffer never exceeds k rows, so partial
    * aggregation stays map-side and merge traffic is O(k) per group per
    * task — the only top-k-per-group shape that survives groups with
    * billions of rows. Deterministic: ties in `ord` break on `id`.
    */
  final class TopK(k: Int) extends Aggregator[TopKRow, TopKBuf, TopKBuf] {
    private def top(a: Seq[TopKRow], b: Seq[TopKRow]): Seq[TopKRow] =
      (a ++ b).sortBy(r => (r.ord, r.id)).take(k)
    def zero: TopKBuf = TopKBuf(Vector.empty)
    def reduce(b: TopKBuf, in: TopKRow): TopKBuf = TopKBuf(top(b.items, Seq(in)))
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf = TopKBuf(top(a.items, b.items))
    def finish(b: TopKBuf): TopKBuf = b
    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Register SQL-callable forms: `weighted_avg(x, w)`, `topk3(ord, id)`. */
  def register(s: SparkSession): Unit = {
    s.udf.register("weighted_avg", functions.udaf(WeightedAvg))
    s.udf.register("topk3", functions.udaf(new TopK(3)))
  }
}
