package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries frequent-items sketch (the second custom aggregate
  * alongside [[HistogramAgg]]): one bounded-memory pass over any
  * high-cardinality key column yields ≤ k−1 candidate heavy hitters plus
  * the exact total row count.
  *
  * Buffer is (counters ≤ k−1 entries, total): partial state is O(k)
  * regardless of key cardinality, so the "aggregation" ships k counters per
  * partition instead of shuffling a per-key count for every distinct key —
  * at 100 TB with billions of distinct keys that is the difference between
  * a kilobyte-sized merge tree and a full corpus shuffle.
  *
  * Guarantees (classic MG, preserved under the subtract-k-th-largest merge
  * — Agarwal et al., "Mergeable Summaries", PODS 2012):
  *   - est(x) ≤ true(x)                  (estimates never overcount)
  *   - true(x) − est(x) ≤ total / k      (bounded undercount)
  *   - hence every x with true(x) > total/k survives in the counters —
  *     the candidate set is a SUPERSET of the true heavy hitters, which is
  *     what makes a deterministic exact-recount second pass possible
  *     (Summaries.q107HeavyHitters).
  */
case class MisraGriesAgg(k: Int)
  extends Aggregator[String, (Map[String, Long], Long), (Map[String, Long], Long)] {

  require(k >= 2, s"need k >= 2 counters, got $k")

  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  override def reduce(b: (Map[String, Long], Long), x: String)
      : (Map[String, Long], Long) = {
    val (m, n) = b
    if (m.contains(x)) (m.updated(x, m(x) + 1L), n + 1)
    else if (m.size < k - 1) (m.updated(x, 1L), n + 1)
    else {
      // decrement-all: drains one unit from k counters including the
      // arrival — the source of the total/k undercount bound
      val dec = m.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      (dec, n + 1)
    }
  }

  override def merge(a: (Map[String, Long], Long), b: (Map[String, Long], Long))
      : (Map[String, Long], Long) = {
    val combined = b._1.foldLeft(a._1) { case (m, (x, c)) =>
      m.updated(x, m.getOrElse(x, 0L) + c)
    }
    val trimmed =
      if (combined.size <= k - 1) combined
      else {
        // subtract the k-th largest count from every counter, drop ≤ 0:
        // ≤ k−1 survive and the undercount bounds add
        val kth = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
        combined.view.mapValues(_ - kth).filter(_._2 > 0L).toMap
      }
    (trimmed, a._2 + b._2)
  }

  override def finish(b: (Map[String, Long], Long)): (Map[String, Long], Long) = b

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder[(Map[String, Long], Long)]()
  override def outputEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder[(Map[String, Long], Long)]()
}
