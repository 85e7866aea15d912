package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Flattened probe matrix with precomputed norms — ONE reference object
  * shared by interpreted eval and generated code, so the probe count never
  * shows up in plan-node or generated-method size. Arithmetic is
  * op-for-op [[VecMath.cosineG]]: the query vector's norm accumulates in
  * index order once, each probe's norm was accumulated in index order at
  * construction, and each dot runs in index order — so every per-probe
  * cosine is bitwise what `cosine_sim(vec, lit(probe))` returns. */
final class ProbeKernel(probes: Array[Array[Double]]) extends Serializable {
  private val k = probes.length
  private val lens = probes.map(_.length)
  private val maxLen = if (k == 0) 0 else lens.max
  private val flat = new Array[Double](k * maxLen)
  private val norms = new Array[Double](k)

  locally {
    var p = 0
    while (p < k) {
      val row = probes(p)
      var s = 0.0
      var j = 0
      while (j < row.length) {
        flat(p * maxLen + j) = row(j)
        s += row(j) * row(j)
        j += 1
      }
      norms(p) = math.sqrt(s)
      p += 1
    }
  }

  def nProbes: Int = k

  /** Max over probes of cosine(a, probe). A NaN cosine (zero-norm query or
    * probe vector) propagates as the result — NaN is the largest double
    * under Spark's ordering, so this is exactly what the retired
    * `greatest(cosine_sim(...), …)` ladder returned; a degenerate vector
    * is loud (NaN output) rather than silently skipped. */
  def maxCosine(a: ArrayData, aFloat: Boolean): Double = {
    val na = a.numElements()
    val av = new Array[Double](na)
    var sa = 0.0
    var i = 0
    while (i < na) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      av(i) = x
      sa += x * x
      i += 1
    }
    val sqa = math.sqrt(sa)
    var best = Double.NegativeInfinity
    var p = 0
    while (p < k) {
      val off = p * maxLen
      val n = math.min(na, lens(p))
      var dot = 0.0
      var j = 0
      while (j < n) { dot += av(j) * flat(off + j); j += 1 }
      val c = dot / (sqa * norms(p))
      if (java.lang.Double.isNaN(c)) return Double.NaN
      if (c > best) best = c
      p += 1
    }
    best
  }

  /** Index (0-based, row order of the constructor matrix) of the max-cosine
    * probe, ties broken toward the SMALLEST index (strict `>` keeps the
    * first maximum). Mirrors the `greatest(struct(csim, -cid))` centroid
    * ladder bit-for-bit when rows are sorted by ascending cid: greatest
    * picks max csim then min cid, and under Spark's total order NaN sorts
    * LARGEST — so a NaN cosine (degenerate query or probe vector) wins over
    * every finite one, first NaN winning among several. Per-probe cosine
    * arithmetic is the same op-for-op [[VecMath.cosineG]] loop as
    * [[maxCosine]]. */
  def argmaxCosine(a: ArrayData, aFloat: Boolean): Int = {
    val na = a.numElements()
    val av = new Array[Double](na)
    var sa = 0.0
    var i = 0
    while (i < na) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      av(i) = x
      sa += x * x
      i += 1
    }
    val sqa = math.sqrt(sa)
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var bestNaN = false
    var p = 0
    while (p < k && !bestNaN) {
      val off = p * maxLen
      val n = math.min(na, lens(p))
      var dot = 0.0
      var j = 0
      while (j < n) { dot += av(j) * flat(off + j); j += 1 }
      val c = dot / (sqa * norms(p))
      if (java.lang.Double.isNaN(c)) { bestNaN = true; bestIdx = p }
      else if (c > best) { best = c; bestIdx = p }
      p += 1
    }
    bestIdx
  }
}

/** Native max-cosine-against-a-probe-matrix kernel (builder-brief path
  * (b)): `greatest(cosine_sim(vec, lit(p1)), …, cosine_sim(vec, lit(pk)))`
  * is k expression nodes and k·dims literals — at 10k probes the generated
  * projection blows Janino's 64 KB method limit, drops out of whole-stage
  * codegen and still pays k expression evals per row. This expression is
  * ONE plan node whose probe matrix rides along as a single reference
  * object (flattened, norms precomputed), evaluated as one fused loop —
  * codegen survives at any probe count, and per-row cost is the pure
  * k·dims multiply-adds. Bitwise-identical to the ladder for
  * non-degenerate vectors (same accumulation orders; see [[ProbeKernel]]).
  *
  * SQL form: `max_cosine_probes(vec, probes)` where `probes` must be a
  * FOLDABLE array<array<double>> literal (`typedlit(...)`) — the builder
  * extracts the matrix at resolution time, so the literal never reaches
  * the physical plan. */
case class MaxCosineProbes(child: Expression, probes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_cosine_probes"

  // Array fields give a case class reference-based equals/hashCode, which
  // defeats Catalyst canonicalization / common-subexpression elimination
  // for structurally identical kernel calls — compare matrix CONTENTS.
  override def equals(other: Any): Boolean = other match {
    case m: MaxCosineProbes =>
      child == m.child && java.util.Arrays.deepEquals(
        probes.asInstanceOf[Array[AnyRef]], m.probes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(
      probes.asInstanceOf[Array[AnyRef]])

  private lazy val eF = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val kernel = new ProbeKernel(probes)

  override protected def nullSafeEval(v: Any): Any =
    kernel.maxCosine(v.asInstanceOf[ArrayData], eF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("probeKernel", kernel,
      classOf[ProbeKernel].getName)
    defineCodeGen(ctx, ev, v => s"$ref.maxCosine($v, $eF)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native argmax-cosine-against-a-probe-matrix kernel — the r20 lift for
  * the IVF centroid-assignment ceiling: `assignToCentroid`'s literal
  * `greatest(struct(cosine_sim(...), -cid), …)` ladder is k expression
  * nodes and blows Janino's 64 KB generated-method limit in the low
  * hundreds of centroids, which is why `IndexParams.ivfK` clamped at 256
  * (r19 VERDICT task 2). Same dissolution as [[MaxCosineProbes]]: ONE plan
  * node carrying the centroid matrix as a reference object, one fused
  * argmax loop, whole-stage codegen at any k. Returns the 0-based ROW
  * INDEX of the winning probe (ties → smallest index; NaN wins — see
  * [[ProbeKernel.argmaxCosine]]); the caller maps index → id via a literal
  * array lookup, keeping ids out of the kernel.
  *
  * SQL form: `argmax_cosine_probes(vec, probes)` with `probes` a FOLDABLE
  * array<array<double>> literal, extracted at resolution time. */
case class ArgmaxCosineProbes(child: Expression, probes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "argmax_cosine_probes"

  // contents-based equality — the MaxCosineProbes canonicalization rule
  override def equals(other: Any): Boolean = other match {
    case m: ArgmaxCosineProbes =>
      child == m.child && java.util.Arrays.deepEquals(
        probes.asInstanceOf[Array[AnyRef]], m.probes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(
      probes.asInstanceOf[Array[AnyRef]])

  private lazy val eF = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val kernel = new ProbeKernel(probes)

  override protected def nullSafeEval(v: Any): Any =
    kernel.argmaxCosine(v.asInstanceOf[ArrayData], eF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("probeKernel", kernel,
      classOf[ProbeKernel].getName)
    defineCodeGen(ctx, ev, v => s"$ref.argmaxCosine($v, $eF)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared resolution-time plumbing for the probe-matrix kernel family:
  * extract the foldable matrix literal into the driver-side double array
  * the kernel carries, and coerce the vector argument to a float/double
  * array — ONE definition, so a fix (null row handling, accepted element
  * types) can never reach one builder and miss the other. */
private[functions] object ProbeMatrixBuilder {
  def extract(exprs: Seq[Expression],
              name: String): (Expression, Array[Array[Double]]) = {
    require(exprs.length == 2, s"$name(vec, probes_literal)")
    val probesExpr = exprs(1)
    require(probesExpr.foldable,
      s"$name: the probe matrix must be a literal (typedlit)")
    // shape BEFORE eval: a flat array (or non-array) second argument is
    // as much one typo away as an int matrix, and would otherwise die in
    // the casts below with a bare ClassCastException
    require(probesExpr.dataType match {
        case ArrayType(ArrayType(_, _), _) => true
        case _ => false
      },
      s"$name: the probe matrix must be array<array<float|double>>, got " +
        probesExpr.dataType.sql)
    val outer = probesExpr.eval().asInstanceOf[ArrayData]
    require(outer != null && outer.numElements() > 0,
      s"$name: empty probe matrix")
    val elemType = probesExpr.dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[ArrayType].elementType
    // a loud contract beats the ClassCastException getDouble would throw
    // on int-backed ArrayData (these are registered SQL functions — an
    // integer literal matrix is one typo away)
    require(elemType == FloatType || elemType == DoubleType,
      s"$name: probe matrix elements must be float or double, got $elemType" +
        " — cast the literal (array<array<double>>)")
    val innerFloat = elemType == FloatType
    val probes = (0 until outer.numElements()).map { i =>
      val row = outer.getArray(i)
      // loud-contract completeness (r20 ADVICE): a literal like
      // array(array(1.0d), null) returns a null inner row here and
      // numElements() would NPE without naming the culprit
      require(row != null, s"$name: probe matrix row $i is null")
      Array.tabulate(row.numElements()) { j =>
        if (innerFloat) row.getFloat(j).toDouble else row.getDouble(j)
      }
    }.toArray
    val vec = exprs.head.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => exprs.head
      case _ => Cast(exprs.head, ArrayType(DoubleType))
    }
    (vec, probes)
  }
}

object ArgmaxCosineProbesFunction {
  val info = (
    FunctionIdentifier("argmax_cosine_probes"),
    new ExpressionInfo(classOf[ArgmaxCosineProbes].getName, "argmax_cosine_probes"),
    (exprs: Seq[Expression]) => {
      val (vec, probes) =
        ProbeMatrixBuilder.extract(exprs, "argmax_cosine_probes")
      ArgmaxCosineProbes(vec, probes)
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)
}

object MaxCosineProbesFunction {
  val info = (
    FunctionIdentifier("max_cosine_probes"),
    new ExpressionInfo(classOf[MaxCosineProbes].getName, "max_cosine_probes"),
    (exprs: Seq[Expression]) => {
      val (vec, probes) =
        ProbeMatrixBuilder.extract(exprs, "max_cosine_probes")
      MaxCosineProbes(vec, probes)
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)
}
