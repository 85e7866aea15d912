package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for interpreted eval and generated code. */
object ShingleMath {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Word n-gram shingles of a space-tokenized string — exactly the rows
    * `explode(transform(sequence(...), i -> concat_ws(' ', tok[i..i+n-1])))`
    * would produce over `filter(split(text, ' '), _ <> '')` (and exactly the
    * DuckDB oracle's `t[i] || ' ' || ... || t[i+n-1]`): one occurrence per
    * position, document order, single-space joined, empty when the doc has
    * fewer than n tokens. One pass over the UTF-8 bytes; ASCII space (0x20)
    * never occurs inside a multi-byte UTF-8 sequence, so byte scanning is
    * safe for any input. */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val len = b.length
    var tokCount = 0
    var i = 0
    var inTok = false
    while (i < len) {
      if (b(i) == 0x20) inTok = false
      else { if (!inTok) tokCount += 1; inTok = true }
      i += 1
    }
    if (tokCount < n) return Empty
    val starts = new Array[Int](tokCount)
    val ends = new Array[Int](tokCount)
    i = 0; inTok = false
    var t = 0
    while (i < len) {
      if (b(i) == 0x20) inTok = false
      else {
        if (!inTok) { starts(t) = i; t += 1 }
        inTok = true
        ends(t - 1) = i + 1
      }
      i += 1
    }
    val out = new Array[Any](tokCount - n + 1)
    var k = 0
    while (k <= tokCount - n) {
      var size = n - 1
      var j = k
      while (j < k + n) { size += ends(j) - starts(j); j += 1 }
      val sb = new Array[Byte](size)
      var pos = 0
      j = k
      while (j < k + n) {
        val l = ends(j) - starts(j)
        System.arraycopy(b, starts(j), sb, pos, l)
        pos += l
        if (j < k + n - 1) { sb(pos) = 0x20; pos += 1 }
        j += 1
      }
      out(k) = UTF8String.fromBytes(sb)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen word-n-gram shingler.
  *
  * Why a custom Expression (builder-brief path (b)): every shingle-based
  * text operator (Jaccard pairs, MinHash, decontamination, boilerplate,
  * chunk fingerprints) starts from the (doc_id, shingle) relation. The two
  * declarative formulations both have a corpus-scale cost the kernel
  * avoids: the array-HOF form (`transform(sequence(...))`) runs its lambdas
  * interpreted per shingle, and the posexplode+window-lead form is fully
  * codegen'd but must hash-shuffle the exploded token relation (≫ corpus
  * size) to order each document's tokens. The kernel builds each document's
  * shingle array in one partition-local byte pass — no shuffle, no lambda —
  * and `explode` of its result is the same rows the window form produced. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "word_shingles n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleMath.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleMath.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesFunction {
  val info = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs(1).foldable,
        "word_shingles(text, n) with literal n")
      WordShingles(Cast(exprs.head, StringType),
        exprs(1).eval().asInstanceOf[Number].intValue())
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)
}
