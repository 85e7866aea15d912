package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed equi-width histogram Aggregator (SURVEY.md §2.11: the one custom
  * aggregate worth owning — `histogram(col, n)` returning bucket→count in a
  * single pass, reference 07:163-164).
  *
  * Buffer is a fixed `Array[Long]` of bucket counts: mergeable, bounded,
  * shuffle-friendly (the partial state is `buckets × 8` bytes regardless of
  * row count). Bucket index is floor((x-min)/width) clamped to [0, n-1]
  * (same floor semantics as [[graft.ops.Exprs.bucketIdx]], which clamps
  * identically); NaN is ignored. */
case class HistogramAgg(min: Double, max: Double, buckets: Int)
  extends Aggregator[Double, Array[Long], Map[Int, Long]] {

  require(buckets > 0, s"buckets must be positive, got $buckets")
  require(max > min, s"need max > min, got [$min, $max)")

  private val width = (max - min) / buckets

  override def zero: Array[Long] = new Array[Long](buckets)

  override def reduce(b: Array[Long], x: Double): Array[Long] = {
    if (!x.isNaN) {
      val i = math.min(math.max(math.floor((x - min) / width).toInt, 0), buckets - 1)
      b(i) += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Map[Int, Long] =
    b.zipWithIndex.collect { case (n, i) if n > 0 => i -> n }.toMap

  // expression encoders: the partial buffer ships as a flat long array, the
  // result is a real MapType column usable from SQL/DataFrame code
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Map[Int, Long]] = ExpressionEncoder[Map[Int, Long]]()
}
