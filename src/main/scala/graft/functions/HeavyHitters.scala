package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy hitters (Misra & Gries 1982; mergeable-summary
  * form per Agarwal et al., PODS'12) as a real partial-aggregable
  * Spark `Aggregator`: per-partition `reduce` runs the classic
  * k-counter stream algorithm, `merge` sums summaries pointwise and
  * re-compresses by subtracting the (k+1)-th largest count — the
  * standard proof gives every survivor a count within n/(k+1) of
  * truth, and any value with true frequency > n/(k+1) survives. This
  * is the bounded-memory answer to "top values of an unbounded-
  * cardinality column" at 100 TB: the buffer is ≤ k entries per
  * partition regardless of input (contrast exact GROUP BY count,
  * whose state is the distinct count), and the shuffle moves one
  * ≤k-entry map per partition per group.
  *
  * Determinism note (what makes the lane hash-checkable): with
  * k ≥ distinct(values) no eviction or compression ever fires, every
  * path is plain counting, and the result is the EXACT count map
  * independent of partitioning and merge order — so the driver lane
  * runs at k ≥ domain and its oracle is the exact GROUP BY. The lossy
  * regime (k < distinct) is order-dependent by nature; its guarantees
  * are spec-pinned on fixed sequential streams instead.
  */
object HeavyHitters {

  def add(k: Int, m: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) m
    else if (m.contains(v)) m.updated(v, m(v) + 1L)
    else if (m.size < k) m.updated(v, 1L)
    else m.collect { case (key, c) if c > 1L => key -> (c - 1L) }

  def mergeSummaries(k: Int, a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val s = (a.keySet ++ b.keySet).iterator
      .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L))).toMap
    if (s.size <= k) s
    else {
      // subtract the (k+1)-th largest count, drop non-positives — at
      // most k survivors, error adds at most the subtracted value
      val cut = s.values.toSeq.sortBy(-_).apply(k)
      s.collect { case (key, c) if c - cut > 0L => key -> (c - cut) }
    }
  }

  class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"MisraGriesAgg: k must be >= 1, got $k")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(m: Map[String, Long], v: String): Map[String, Long] =
      add(k, m, v)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mergeSummaries(k, a, b)
    override def finish(m: Map[String, Long]): Map[String, Long] = m
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }
}
