package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One sampling candidate: `m` = md5 hex of the row id (the deterministic
  * priority — uniform and engine-portable, the q60/q83 trick), `id` the
  * tiebreak, `cents` the row's 2-dp metric scaled to an exact integer so
  * partial sums are order-independent. */
case class SampleCand(m: String, id: Long, cents: Long)

/** Bounded partial state: the ≤K smallest candidates seen so far, kept
  * sorted by (m, id) ascending. */
case class TopKSampleBuf(items: Array[SampleCand])

/** Finished sample statistics: how many rows survived and their exact
  * integer-scaled sum (callers divide back to the metric's scale). */
case class SampleTopK(n_sampled: Long, sum_cents: Long)

/** Two-phase per-group top-K sampler (the q60 100-TB path): each map task
  * keeps only its K smallest-priority candidates per group (a bounded sorted
  * buffer — once full, a row costs ONE comparison against the Kth threshold
  * unless it beats it, which for a uniform md5 priority happens ~K·ln(n)/n
  * of the time), partials merge as a K-of-(K+K) sorted-array merge, and the
  * finish emits exact integer stats. The shuffle carries at most one ≤K
  * buffer per (map task, group) — never the group's rows — so parallelism is
  * the scan's, not the class count's, unlike the per-class total-order
  * window form ([[graft.prep.DataPrep.q60StratifiedSample]] keeps that form
  * as the exact-semantics oracle; DataPrepSpec pins both paths bitwise
  * equal). */
case class TopKSampleAgg(k: Int)
  extends Aggregator[SampleCand, TopKSampleBuf, SampleTopK] {

  require(k > 0, s"k must be positive, got $k")

  // md5 hex is ASCII, so String compareTo matches the UTF8 binary order the
  // window form's ORDER BY md5(...) uses in both engines
  private def lt(am: String, ai: Long, b: SampleCand): Boolean = {
    val c = am.compareTo(b.m)
    c < 0 || (c == 0 && ai < b.id)
  }

  override def zero: TopKSampleBuf = TopKSampleBuf(Array.empty)

  override def reduce(b: TopKSampleBuf, x: SampleCand): TopKSampleBuf = {
    val a = b.items
    if (a.length >= k && !lt(x.m, x.id, a(a.length - 1))) b
    else {
      // binary search for the insertion point among the sorted candidates
      var lo = 0; var hi = a.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(a(mid).m, a(mid).id, x)) lo = mid + 1 else hi = mid
      }
      val outLen = math.min(a.length + 1, k)
      val out = new Array[SampleCand](outLen)
      System.arraycopy(a, 0, out, 0, lo)
      out(lo) = x
      System.arraycopy(a, lo, out, lo + 1, outLen - lo - 1)
      TopKSampleBuf(out)
    }
  }

  override def merge(x: TopKSampleBuf, y: TopKSampleBuf): TopKSampleBuf = {
    val a = x.items; val b = y.items
    if (b.isEmpty) x
    else if (a.isEmpty) y
    else {
      val out = new Array[SampleCand](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        out(o) =
          if (j >= b.length || (i < a.length && lt(a(i).m, a(i).id, b(j)))) {
            val v = a(i); i += 1; v
          } else { val v = b(j); j += 1; v }
        o += 1
      }
      TopKSampleBuf(out)
    }
  }

  override def finish(b: TopKSampleBuf): SampleTopK = {
    var s = 0L; var i = 0
    while (i < b.items.length) { s += b.items(i).cents; i += 1 }
    SampleTopK(b.items.length.toLong, s)
  }

  override def bufferEncoder: Encoder[TopKSampleBuf] =
    ExpressionEncoder[TopKSampleBuf]()
  override def outputEncoder: Encoder[SampleTopK] =
    ExpressionEncoder[SampleTopK]()
}
