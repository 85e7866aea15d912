package graft

import org.apache.spark.sql.functions._
import graft.functions.{GeoMath, GraftFunctions}
import graft.ops.Exprs

class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("haversine_km SQL function registers and evaluates") {
    GraftFunctions.register(spark)
    val d = spark.sql("SELECT haversine_km(0.0, 0.0, 0.0, 1.0) AS d").head().getDouble(0)
    assert(math.abs(d - 111.19) < 0.1, s"1 degree at equator ≈ 111.19 km, got $d")
    // null propagation
    assert(spark.sql("SELECT haversine_km(NULL, 0.0, 0.0, 1.0) AS d").head().isNullAt(0))
  }

  test("native expression agrees with the composed column tree") {
    GraftFunctions.register(spark)
    val pts = (1 to 500).map { i =>
      (i * 0.17 % 180 - 90, i * 0.37 % 360 - 180, i * 0.23 % 180 - 90, i * 0.53 % 360 - 180)
    }.toDF("lat1", "lon1", "lat2", "lon2")
    pts.createOrReplaceTempView("pts")
    val both = spark.sql(
      "SELECT haversine_km(lat1, lon1, lat2, lon2) AS fused FROM pts")
      .withColumn("id", monotonically_increasing_id())
      .join(
        pts.select(Exprs.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("composed"))
          .withColumn("id", monotonically_increasing_id()), "id")
    both.collect().foreach { r =>
      val (f, c) = (r.getAs[Double]("fused"), r.getAs[Double]("composed"))
      assert(math.abs(f - c) < 1e-9, s"fused=$f composed=$c")
    }
  }

  test("fused expression participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = Tables.events(spark, Sf0001)
      .selectExpr("haversine_km(value - 50, 0.0, 0.0, 0.0) AS d")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, p.take(1500))
  }

  test("kernel matches a known distance (JFK-LAX)") {
    val d = GeoMath.haversineKm(40.6413, -73.7781, 33.9416, -118.4085)
    assert(d > 3950 && d < 4000, s"JFK-LAX: $d")
  }

  test("token_count agrees with the declarative size(filter(split(...))) form") {
    import spark.implicits._
    graft.functions.TokenCountFunction.register(spark)
    val docs = Seq("a b c", "  leading  double  ", "", " ", "one",
      "héllo wörld ünïcode", "a\tb c" /* tab is not a separator */)
      .toDF("text")
    val out = docs.select(
        call_function("token_count", col("text")).as("native"),
        size(filter(split(col("text"), " "), x => x =!= "")).as("declarative"))
      .collect()
    out.foreach(r => assert(r.getInt(0) === r.getInt(1),
      s"mismatch: native=${r.getInt(0)} declarative=${r.getInt(1)}"))
    // null propagates like the declarative form
    val n = Seq[Option[String]](None).toDF("text")
      .select(call_function("token_count", col("text"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("GraftExtensions wires functions + optimizer rule into a real session") {
    import org.apache.spark.sql.SparkSession
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, fresh session state with the production
      // spark.sql.extensions entry point applied
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne old)
      val row = s2.sql(
        """SELECT token_count('a  b c') AS tc,
          |       round(haversine_km(0D, 0D, 0D, 1D), 1) AS hv,
          |       round(cosine_sim(array(1D, 0D), array(1D, 0D)), 6) AS cs,
          |       word_shingles('a b c', 2) AS ws,
          |       simhash64('a b c') AS sh,
          |       size(winnow_fps('a b c d e f', 3, 4)) AS wf,
          |       hyperplane_sig(array(0.5D, -0.25D), 4, 0) AS hs
          |""".stripMargin).head()
      assert(row.getInt(0) === 3)
      assert(row.getDouble(1) === 111.2)
      assert(row.getDouble(2) === 1.0)
      assert(row.getSeq[String](3) === Seq("a b", "b c"))
      assert(row.getLong(4) !== 0L)
      assert(row.getInt(5) === 1)
      assert(row.getLong(6) >= 0L && row.getLong(6) < 16L)
      // the injected optimizer rule fires without any per-session opt-in
      // (non-constant input: a literal would be constant-folded away
      // before the rule can see the split/filter/size pattern)
      val p = s2.range(1)
        .select(size(filter(
          split(concat(lit("x y "), col("id").cast("string")), " "),
          x => x =!= "")))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("token_count"), p)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("RewriteTokenCount rewrites the declarative pattern, preserves results") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ graft.functions.RewriteTokenCount
    try {
      val declarative = spark.range(4)
        .select(concat(lit("a  b x"), col("id").cast("string")).as("text"))
        .select(size(filter(split(col("text"), " "), x => x =!= "")).as("n"))
      assert(declarative.queryExecution.optimizedPlan.toString.contains("token_count"),
        declarative.queryExecution.optimizedPlan.toString)
      assert(declarative.collect().map(_.getInt(0)).toSeq === Seq(3, 3, 3, 3))
      // a different separator must NOT be rewritten
      val other = spark.range(1)
        .select(size(filter(split(lit("a,b"), ","), x => x =!= "")).as("n"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("token_count"))
      assert(other.collect().head.getInt(0) === 2)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("token_count participates in whole-stage codegen") {
    graft.functions.TokenCountFunction.register(spark)
    // range source (a local Seq relation would be constant-folded into a
    // LocalTableScan with no codegen stage to inspect)
    val df = spark.range(4)
      .select(call_function("token_count",
        concat(lit("a b x"), col("id").cast("string"))).as("n"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, p.take(1500))
  }
  test("word_shingles kernel matches the declarative HOF formulation") {
    graft.functions.WordShinglesFunction.register(spark)
    val docs = Seq(
      "a b c d e",                 // plain
      "  a   b  c ",               // repeated / leading / trailing spaces
      "single",                    // shorter than n
      "",                          // empty
      "x y",                       // exactly n
      "héllo wörld ünïcode token"  // multi-byte UTF-8
    ).toDF("text")
    for (n <- Seq(1, 2, 3)) {
      val kernel = docs.select(col("text"),
        call_function("word_shingles", col("text"), lit(n)).as("k"))
      val hof = docs.select(col("text"),
        graft.text.TextOps.wordShinglesOrdered(
          graft.text.TextOps.tokens(col("text")), n).as("h"))
      val joined = kernel.join(hof, "text").select("k", "h").collect()
      joined.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1),
          s"n=$n: kernel ${r.getSeq[String](0)} vs hof ${r.getSeq[String](1)}")
      }
    }
    // null text → null array (UnaryExpression null propagation)
    val nullRow = Seq((1, Option.empty[String])).toDF("id", "text")
      .select(call_function("word_shingles", col("text"), lit(2)).as("k"))
      .head()
    assert(nullRow.isNullAt(0))
  }

  test("word_shingle_distinct_count matches explode -> distinct -> count, " +
      "including duplicate shingles and sub-n docs") {
    graft.functions.WordShingleDistinctCountFunction.register(spark)
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b a b a b"),          // heavy duplicate shingles
      (3L, "single"),               // shorter than n -> 0
      (4L, ""),                     // empty -> 0
      (5L, "héllo wörld héllo wörld ünïcode")) // UTF-8 + dup
      .toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val kernel = docs.select(col("doc_id"),
        call_function("word_shingle_distinct_count", col("text"), lit(n)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val declared = graft.text.TextOps.shingleRows(docs, n).distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.collect().map(_.getLong(0)).foreach { id =>
        assert(kernel(id) === declared.getOrElse(id, 0L),
          s"n=$n doc=$id: kernel ${kernel(id)} vs declared ${declared.get(id)}")
      }
    }
    // also against the real documents corpus, the jaccardPairs usage shape
    val d = Tables.documents(spark, Sf0001)
    val kernelC = d.select(col("doc_id"),
      call_function("word_shingle_distinct_count", col("text"), lit(3)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val declaredC = graft.text.TextOps.shingleRows(d, 3).distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    declaredC.foreach { case (id, c) => assert(kernelC(id) === c) }
  }

  test("hyperplane_sig participates in whole-stage codegen") {
    graft.functions.HyperplaneSigFunction.register(spark)
    // range source so there is a codegen stage to inspect (see token_count)
    val df = spark.range(8)
      .select(call_function("hyperplane_sig",
        array(col("id").cast("double"), lit(-0.5d)), lit(6), lit(0)).as("sig"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, p.take(1500))
    // null embedding propagates (TernaryExpression null semantics)
    val n = spark.sql("SELECT hyperplane_sig(CAST(NULL AS ARRAY<DOUBLE>), 4, 0)").head()
    assert(n.isNullAt(0))
  }

  test("simhash64 / winnow_fps kernels match the composed HOF forms") {
    graft.functions.Simhash64Function.register(spark)
    graft.functions.WinnowFpsFunction.register(spark)
    val docs = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "  spaced   out  tokens ",
      "one two",        // fewer shingles than the window
      "one two three",  // exactly one shingle
      "solo",
      "",
      "héllo wörld ünïcode tökens here now"
    ).toDF("text")
    val rows = docs.select(
      call_function("simhash64", col("text")).as("k_sim"),
      graft.text.TextOps.simhash64(graft.text.TextOps.tokens(col("text"))).as("h_sim"),
      call_function("winnow_fps", col("text"), lit(3), lit(4)).as("k_fp"),
      graft.text.TextOps.winnowFingerprints(
        graft.text.TextOps.tokens(col("text")), 3, 4).as("h_fp")
    ).collect()
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1), s"simhash mismatch: $r")
      assert(r.getSeq[Long](2) === r.getSeq[Long](3), s"winnow mismatch: $r")
    }
  }

}
