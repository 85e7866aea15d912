package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.SparkSession

/** Static kernel shared by interpreted eval and generated code. */
object GeoMath {
  final val EarthRadiusKm = 6371.0

  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val s1 = math.sin(dLat / 2)
    val s2 = math.sin(dLon / 2)
    val a = s1 * s1 + math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * s2 * s2
    2.0 * EarthRadiusKm * math.asin(math.sqrt(a))
  }
}

/** Native Catalyst expression for great-circle distance — the one deliberate
  * use of the custom-`Expression` extension path (SURVEY.md §4 concluded no
  * custom Rules/Strategies are required; this demonstrates option (b) from
  * the builder brief where it genuinely helps): the composed column tree in
  * [[graft.ops.Exprs.haversineKm]] is ~20 expression nodes, this is one
  * fused static call inside whole-stage codegen.
  *
  * Note the kernel (`GeoMath.haversineKm`) uses the same formula as the
  * composed tree, so the two agree to the last ulp only when evaluation
  * order matches; both are deterministic. */
case class HaversineKm(lat1: Expression, lon1: Expression,
                       lat2: Expression, lon2: Expression)
  extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "haversine_km"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoMath.haversineKm(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.GeoMath.haversineKm($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}

/** Function registration — both paths:
  *   - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *   - [[GraftFunctions.register]] for an existing session
  */
object GraftFunctions {
  val haversineInfo = (
    FunctionIdentifier("haversine_km"),
    new ExpressionInfo(classOf[HaversineKm].getName, "haversine_km"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 4, "haversine_km(lat1, lon1, lat2, lon2)")
      // inputs coerced here instead of via ExpectsInputTypes (AbstractDataType
      // is private[sql]); Cast is a no-op on already-double children
      val d = exprs.map(e => Cast(e, DoubleType))
      HaversineKm(d(0), d(1), d(2), d(3))
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      haversineInfo._1, haversineInfo._2, haversineInfo._3)
}

/** `SparkSessionExtensions` entry point: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and
  * `SELECT haversine_km(...)` works in plain SQL. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.haversineInfo)
    ext.injectFunction(CosineSimFunction.info)
    ext.injectFunction(TokenCountFunction.info)
    ext.injectFunction(WordShinglesFunction.info)
    ext.injectFunction(Simhash64Function.info)
    ext.injectFunction(WinnowFpsFunction.info)
    ext.injectFunction(HyperplaneSigFunction.info)
    ext.injectOptimizerRule(_ => RewriteTokenCount)
  }
}
