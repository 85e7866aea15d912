package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for interpreted eval and generated code. */
object TextMath {
  /** Count of non-empty space-separated tokens — exactly
    * `size(filter(split(text, " "), _ != ""))` / DuckDB
    * `len(list_filter(string_split(text, ' '), x -> x <> ''))`, as one pass
    * over the UTF-8 bytes with zero allocation. ASCII space (0x20) never
    * occurs inside a multi-byte UTF-8 sequence, so byte scanning is safe
    * for any input. */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0; var cnt = 0; var inTok = false
    while (i < n) {
      if (s.getByte(i) == 0x20) inTok = false
      else { if (!inTok) cnt += 1; inTok = true }
      i += 1
    }
    cnt
  }
}

/** Native codegen whitespace token counter.
  *
  * Why a custom Expression (builder-brief path (b)): the declarative form
  * `size(filter(split(text, " "), _ != ""))` materializes the token array
  * and runs its lambda interpreted (HigherOrderFunction lambdas never reach
  * codegen — CLAUDE.md perf rules), all to produce one int. Token counting
  * runs over every document of the corpus in q44/q62, where the per-row
  * array allocation is pure waste at 100 TB. */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any =
    TextMath.tokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextMath.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCountFunction {
  val info = (
    FunctionIdentifier("token_count"),
    new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "token_count(text)")
      TokenCount(Cast(exprs.head, StringType))
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)
}
