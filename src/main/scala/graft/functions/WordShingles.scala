package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for interpreted eval and generated code. */
object ShingleMath {
  private val Empty = new GenericArrayData(Array.empty[Any])
  /** Spark's `xxhash64(...)` default seed — kernels must hash identically
    * to the built-in expression so composed and fused forms agree. */
  private val XxSeed = 42L

  /** Byte ranges of the non-empty space-separated tokens of `b`:
    * returns (starts, ends), both of length tokCount. */
  private def tokenRanges(b: Array[Byte]): (Array[Int], Array[Int]) = {
    val len = b.length
    var tokCount = 0
    var i = 0
    var inTok = false
    while (i < len) {
      if (b(i) == 0x20) inTok = false
      else { if (!inTok) tokCount += 1; inTok = true }
      i += 1
    }
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
    (starts, ends)
  }

  /** 64-bit SimHash over the document's tokens in one pass — exactly
    * [[graft.text.TextOps.simhash64]]'s semantics (xxhash64 per token,
    * ±1 bit votes, sign-packed; zero tokens → all 64 ties → all bits set)
    * without materializing a token array or 64 aggregate columns. */
  def simhash64(s: UTF8String): Long = {
    val b = s.getBytes
    val (starts, ends) = tokenRanges(b)
    val counts = new Array[Int](64)
    var t = 0
    while (t < starts.length) {
      val h = XXH64.hashUnsafeBytes(b,
        Platform.BYTE_ARRAY_OFFSET + starts(t), ends(t) - starts(t), XxSeed)
      var j = 0
      while (j < 64) {
        counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      t += 1
    }
    var packed = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) >= 0) packed |= (1L << j)
      j += 1
    }
    packed
  }

  /** xxhash64 of each word k-shingle, in document (positional) order —
    * hash of the same single-space-joined strings [[wordShingles]] builds. */
  private def shingleHashes(b: Array[Byte], k: Int): Array[Long] = {
    val (starts, ends) = tokenRanges(b)
    val tokCount = starts.length
    if (tokCount < k) return Array.emptyLongArray
    val out = new Array[Long](tokCount - k + 1)
    var p = 0
    while (p <= tokCount - k) {
      var size = k - 1
      var j = p
      while (j < p + k) { size += ends(j) - starts(j); j += 1 }
      val sb = new Array[Byte](size)
      var pos = 0
      j = p
      while (j < p + k) {
        val l = ends(j) - starts(j)
        System.arraycopy(b, starts(j), sb, pos, l)
        pos += l
        if (j < p + k - 1) { sb(pos) = 0x20; pos += 1 }
        j += 1
      }
      out(p) = XXH64.hashUnsafeBytes(sb, Platform.BYTE_ARRAY_OFFSET, size, XxSeed)
      p += 1
    }
    out
  }

  /** Winnowing fingerprints in one pass — exactly
    * [[graft.text.TextOps.winnowFingerprints]]'s semantics (k-shingle
    * hashes in positional order; ≥w hashes → first-occurrence-distinct
    * mins of each w-window; 1..w-1 hashes → the global min; none → empty)
    * without interpreted lambdas or a per-doc window sort. */
  def winnowFps(s: UTF8String, k: Int, w: Int): ArrayData = {
    val hs = shingleHashes(s.getBytes, k)
    if (hs.length == 0) return Empty
    if (hs.length < w) {
      var m = hs(0)
      var i = 1
      while (i < hs.length) { if (hs(i) < m) m = hs(i); i += 1 }
      return new GenericArrayData(Array[Any](m))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= hs.length - w) {
      var m = hs(i)
      var j = i + 1
      while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

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

/** First-occurrence-distinct word n-gram shingles (r21). `explode` of this
  * array yields exactly the row SET `explode(word_shingles) → distinct`
  * produced per document — distinctness over the shingle STRINGS, no hash
  * shortcut — but partition-locally: the downstream `.distinct()` exchange
  * plus its two hash aggregates over the exploded corpus relation (the
  * widest in the dedup family) disappear from the plan. */
object ShingleDistinct {
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val arr = ShingleMath.wordShingles(s, n)
    val m = arr.numElements()
    if (m == 0) return arr
    val seen = new java.util.LinkedHashSet[UTF8String](Math.max(16, m * 2))
    var i = 0
    while (i < m) { seen.add(arr.getUTF8String(i)); i += 1 }
    if (seen.size == m) return arr
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Companion to [[ShingleMath.wordShingles]]: the number of DISTINCT word
  * n-gram shingles, without materializing the (doc_id, shingle) relation.
  * Distinctness is over the shingle STRINGS (a hash set of the
  * UTF8Strings), bit-identical to `explode → distinct → count` and to the
  * oracle's SQL distinct — no hash-collision hazard. */
object ShingleDistinctCount {
  def count(s: UTF8String, n: Int): Long = {
    val arr = ShingleMath.wordShingles(s, n)
    val m = arr.numElements()
    if (m == 0) return 0L
    val set = new java.util.HashSet[UTF8String](Math.max(16, m * 2))
    var i = 0
    while (i < m) { set.add(arr.getUTF8String(i)); i += 1 }
    set.size.toLong
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

/** Native first-occurrence-distinct shingler (see
  * [[ShingleDistinct.shingles]]); the `.distinct()`-free path under the
  * dedup family's exploded relation. */
case class WordShinglesDistinct(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "word_shingles_distinct n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles_distinct"

  override protected def nullSafeEval(input: Any): Any =
    ShingleDistinct.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleDistinct.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesDistinctFunction {
  val info = (
    FunctionIdentifier("word_shingles_distinct"),
    new ExpressionInfo(classOf[WordShinglesDistinct].getName,
      "word_shingles_distinct"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs(1).foldable,
        "word_shingles_distinct(text, n) with literal n")
      WordShinglesDistinct(Cast(exprs.head, StringType),
        exprs(1).eval().asInstanceOf[Number].intValue())
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)
}

/** Native distinct-shingle counter (see [[ShingleDistinctCount.count]]).
  *
  * Why a kernel: Jaccard's denominator needs |distinct shingles| per doc.
  * The declarative form is a SECOND corpus explode + per-doc aggregation
  * next to the pair join's own explode (exchange reuse cannot merge them —
  * they aggregate under different partitionings), i.e. one extra full
  * tokenize+shuffle pass at 100 TB. The kernel folds that pass into the
  * document scan: one partition-local byte pass per row, no explode, no
  * exchange, whole-stage codegen. */
case class WordShingleDistinctCount(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "word_shingle_distinct_count n must be >= 1")
  override def dataType: DataType = LongType
  override def prettyName: String = "word_shingle_distinct_count"

  override protected def nullSafeEval(input: Any): Any =
    ShingleDistinctCount.count(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleDistinctCount.count($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleDistinctCountFunction {
  val info = (
    FunctionIdentifier("word_shingle_distinct_count"),
    new ExpressionInfo(classOf[WordShingleDistinctCount].getName,
      "word_shingle_distinct_count"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs(1).foldable,
        "word_shingle_distinct_count(text, n) with literal n")
      WordShingleDistinctCount(Cast(exprs.head, StringType),
        exprs(1).eval().asInstanceOf[Number].intValue())
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)
}

/** Native one-pass SimHash (see [[ShingleMath.simhash64]]). The composed
  * form ([[graft.text.TextOps.simhash64]]) runs 64 interpreted aggregate
  * lambdas per document; the row-based form needs an explode + a 64-column
  * aggregation. The kernel is a single partition-local pass. */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    ShingleMath.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleMath.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash64Function {
  val info = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "simhash64(text)")
      Simhash64(Cast(exprs.head, StringType))
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)
}

/** Native one-pass winnowing fingerprints (see [[ShingleMath.winnowFps]]). */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnow_fps k and w must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    ShingleMath.winnowFps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleMath.winnowFps($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFpsFunction {
  val info = (
    FunctionIdentifier("winnow_fps"),
    new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
        "winnow_fps(text, k, w) with literal k and w")
      WinnowFps(Cast(exprs.head, StringType),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)
}
