package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}
import org.apache.spark.sql.SparkSession

/** Hyperplane-signature kernels (interpreted eval and codegen share them). */
object SigMath {
  /** Bit `p` of the signature is the sign of Σ_d e[d]·sin(131·q +
    * (17 + 0.731·q)·d) with q = offset+p; bits fold MSB-first into a long
    * (acc·2 + bit). One fused pass — bit-identical to the composed
    * `aggregate(transform(sequence(...)))` form (same java.lang.Math.sin,
    * same multiply and left-fold-add order), which runs its nested lambdas
    * interpreted at ~planes×dim expression-tree walks per row. Measured on
    * q100's 6×8-plane dedup: the composed form dominated the query
    * (8.6 s); the kernel removes that wall.
    *
    * The 0.731·q·d CROSS term is load-bearing (r12): without it the weight
    * vector was sin(131q + 17d) = sin(131q)cos(17d) + cos(131q)sin(17d) —
    * EVERY plane of every table lay in the single 2-d subspace spanned by
    * (cos 17d, sin 17d), so a k-plane signature could take at most ~2k
    * values (the cells of k lines through the origin in one 2-d
    * projection), measured 10/20/32 distinct at planes 5/10/16 over 5,000
    * random 64-d vectors. Candidate joins therefore scaled as n²/2k no
    * matter the plane count — the real 100-TB keyspace bug behind r11's
    * "fixed parameters" soft spot. The cross term gives plane q its own
    * d-frequency (17 + 0.731·q), making the family full-rank: measured
    * 898/1024 distinct at 10 planes (max bucket 35 of 5,000) while
    * near-dup locality holds (94.8% same-sig under ±0.02 noise). */
  def hyperplaneSigG(e: ArrayData, planes: Int, offset: Int,
                     eFloat: Boolean): Long = {
    val n = e.numElements()
    var acc = 0L
    var p = 0
    while (p < planes) {
      val q = (offset + p).toDouble
      val base = 131.0 * q
      val freq = 17.0 + 0.731 * q
      var s = 0.0
      var d = 0
      while (d < n) {
        val x = if (eFloat) e.getFloat(d).toDouble else e.getDouble(d)
        s += x * java.lang.Math.sin(base + freq * d.toDouble)
        d += 1
      }
      acc = acc * 2 + (if (s >= 0) 1L else 0L)
      p += 1
    }
    acc
  }

  def hyperplaneSigF(e: ArrayData, planes: Int, offset: Int): Long =
    hyperplaneSigG(e, planes, offset, eFloat = true)

  def hyperplaneSigD(e: ArrayData, planes: Int, offset: Int): Long =
    hyperplaneSigG(e, planes, offset, eFloat = false)
}

/** Native codegen random-hyperplane LSH signature over a float/double array.
  *
  * Why a custom Expression (builder-brief path (b)): the composed
  * `aggregate(transform(sequence ...))` formulation nests three
  * HigherOrderFunctions, and HOF lambdas never reach codegen (CLAUDE.md
  * perf rule) — every signature walked planes×dim interpreted expression
  * trees per row, which made the LSH bucketing stage (q27/q100) the
  * slowest part of plans whose joins are cheap. Deterministic: no RNG
  * state, reproducible across runs, executors, and engines. */
case class HyperplaneSig(first: Expression, second: Expression,
                         third: Expression) extends TernaryExpression {

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  private lazy val eF = isFloat(first.dataType)

  override protected def nullSafeEval(e: Any, planes: Any, offset: Any): Any =
    SigMath.hyperplaneSigG(e.asInstanceOf[ArrayData],
      planes.asInstanceOf[Int], offset.asInstanceOf[Int], eF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, p, o) =>
      if (eF) s"graft.functions.SigMath.hyperplaneSigF($e, $p, $o)"
      else s"graft.functions.SigMath.hyperplaneSigD($e, $p, $o)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HyperplaneSigFunction {
  val info = (
    FunctionIdentifier("hyperplane_sig"),
    new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3, "hyperplane_sig(embedding, planes, offset)")
      def coerceVec(e: Expression): Expression = e.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => e
        case _ => Cast(e, ArrayType(DoubleType))
      }
      def coerceInt(e: Expression): Expression = e.dataType match {
        case IntegerType => e
        case _ => Cast(e, IntegerType)
      }
      HyperplaneSig(coerceVec(exprs.head), coerceInt(exprs(1)), coerceInt(exprs(2)))
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)
}
