package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Registration glue for Spark's own (internal, codegen'd) bloom-filter
  * expressions, exposed as session functions so graft relations can build
  * and apply semi-join pre-filters without a UDF:
  *
  *   - `graft_bloom_agg(key, est_items, num_bits)` — aggregates a bloom
  *     filter over `xxhash64(key)`; returns the serialized filter as BINARY
  *     (NULL on empty input). These are the exact expressions behind
  *     Spark's `InjectRuntimeFilter` rule — construction and probe both
  *     stay in whole-stage codegen.
  *   - `graft_bloom_might_contain(bloom, key)` — probe; `bloom` must be
  *     foldable (a collected filter re-entering the plan as a literal),
  *     hashes `key` with the SAME XxHash64(seed=42) as the aggregate so a
  *     contained key can never be reported absent (no false negatives —
  *     the property every "identical results with and without" pre-filter
  *     argument rests on).
  *
  * Used by the q96 incremental-dedup gate: bloom over the NEW batch's raw
  * shingle stream (small by contract — the batch), probe on the OLD
  * corpus's capped shingle relation before the candidate join
  * (`TextOps.q96IncrementalDedup`). The filter's size is fixed by
  * `num_bits` at build time, independent of corpus size, so the collected
  * literal is driver-safe by construction. */
object BloomFunctions {
  val aggInfo = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3, "graft_bloom_agg(key, est_items, num_bits)")
      new BloomFilterAggregate(new XxHash64(Seq(exprs(0)), 42L), exprs(1), exprs(2))
    })

  val mightContainInfo = (
    FunctionIdentifier("graft_bloom_might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_might_contain"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_bloom_might_contain(bloom, key)")
      BloomFilterMightContain(exprs(0), new XxHash64(Seq(exprs(1)), 42L))
    })

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      aggInfo._1, aggInfo._2, aggInfo._3)
    spark.sessionState.functionRegistry.registerFunction(
      mightContainInfo._1, mightContainInfo._2, mightContainInfo._3)
  }
}
