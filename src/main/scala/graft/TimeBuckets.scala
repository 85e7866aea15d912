package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.{IndexParams, Similarity}
import graft.text.TextOps

/** Measurement harness for the r12 index-scaling claim (the TimeProbes
  * rule: never conclude from a scan-trivial measurement): candidate-pair
  * counts and warm wall time for the LSH bucket self-join and the SimHash
  * band dedup at 1×/10×/100× the sf0.1 corpus, fixed vs corpus-scaled
  * parameters, with and without the hot-bucket guard.
  *
  * Inflation is DIVERSE — copy i rotates the embedding by (7i mod 64)
  * positions and reverses it past copy 64 (identical copies would plant
  * irreducible exact-duplicate mass no refinement can split, measuring the
  * pathology instead of the scaling); the document corpus gets a copy tag
  * appended, PLUS one deliberately hot digest (every 50th doc shares one
  * constant text) so the band join's straggler scenario is on display.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.TimeBuckets [maxCopies] [skipPairJoinAt]"
  */
object TimeBuckets {
  def main(args: Array[String]): Unit = {
    val maxCopies = args.headOption.map(_.toInt).getOrElse(100)
    // the quadratic pair join gets slow enough to skip past this scale
    val skipPairJoinAt = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Similarity.ensureRegistered(spark)
    graft.functions.Simhash64Function.register(spark)

    def time[A](label: String)(body: => A): A = {
      body // warm: codegen + shuffle-file effects out of the reading
      val t0 = System.nanoTime()
      val r = body
      println(f"$label warm ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }

    // ---- LSH bucket self-join: candidates at fixed vs scaled planes ----
    val base = Tables.embeddings(spark, dir)
    def rotatedCopy(i: Int): DataFrame = {
      val r = (i * 7) % 64
      val flipped = if (i >= 64) reverse(col("embedding")) else col("embedding")
      val rot = if (r == 0) flipped
        else concat(slice(flipped, r + 1, 64 - r), slice(flipped, 1, r))
      base.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        rot.as("embedding"))
    }
    def candidates(corpus: DataFrame, planes: Int, tables: Int,
                   guarded: Boolean): Long = {
      val sigs = array((0 until tables).map(t =>
        lit(t.toLong << 32) +
          Similarity.lshSignature(col("embedding"), planes, lit(t * planes))): _*)
      val x = corpus.withColumn("sig", explode(sigs))
      val a = x.select(col("sig"), col("vec_id").as("cid"), col("embedding").as("ce"))
      val b = x.select(col("sig"), col("vec_id").as("qid"), col("embedding").as("qe"))
      val joined =
        if (guarded)
          Similarity.guardedSigJoin(a, "ce", b, "qe", IndexParams.hotBucketCap())
        else a.join(b, Seq("sig"))
      joined.filter(col("cid") < col("qid"))
        .select(col("cid"), col("qid")).count()
    }
    for (copies <- Seq(1, 10, 100).filter(_ <= maxCopies)) {
      val corpus = (0 until copies).map(rotatedCopy).reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism).persist()
      val n = corpus.count()
      val scaled = IndexParams.lshPlanes(n)
      println(s"== lsh corpus n=$n (x$copies): fixed planes=10, scaled planes=$scaled ==")
      time(s"lsh n=$n fixed10   ")(candidates(corpus, 10, 4, guarded = false))
      time(s"lsh n=$n scaled    ")(candidates(corpus, scaled, 4, guarded = false))
      time(s"lsh n=$n scaled+grd")(candidates(corpus, scaled, 4, guarded = true))
      corpus.unpersist()
    }

    // ---- SimHash band dedup: pair join vs min-per-group window star ----
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    def docCopy(i: Int): DataFrame =
      docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" [v$i]")).as("text"))
    for (copies <- Seq(1, 10, 100).filter(_ <= maxCopies)) {
      val corpus = (0 until copies).map(docCopy).reduce(_ unionByName _)
        // the hot-digest plant: every 50th doc is the same constant text —
        // at 100x that is a ~10k-identical-document band group, the exact
        // straggler the window star exists for
        .withColumn("text",
          when(col("doc_id") % 50 === 0, lit("the hot constant document body"))
            .otherwise(col("text")))
        .repartition(spark.sparkContext.defaultParallelism).persist()
      val n = corpus.count()
      val bandBits = IndexParams.simhashBandBits(n)
      val fp = corpus.select(col("doc_id"), md5(col("text")).as("digest"),
        call_function("simhash64", col("text")).as("sig"))
      println(s"== simhash corpus n=$n (x$copies): bandBits=$bandBits ==")
      val nBands = 64 / bandBits
      if (n <= skipPairJoinAt * 1000L) {
        time(s"simhash n=$n pairjoin  ") {
          val banded = fp.withColumn("band",
            explode(array((0 until nBands).map(b =>
              lit(b.toLong << bandBits) + shiftright(col("sig"), bandBits * b)
                .bitwiseAND(lit((1L << bandBits) - 1))): _*)))
          val a = banded.select(col("band"), col("doc_id").as("i"), col("digest").as("da"))
          val bb = banded.select(col("band"), col("doc_id").as("j"), col("digest").as("db"))
          a.join(bb, Seq("band"))
            .filter(col("i") < col("j") && col("da") === col("db"))
            .select(col("j")).distinct().count()
        }
      } else println(s"simhash n=$n pairjoin   SKIPPED (quadratic past ${skipPairJoinAt}k)")
      time(s"simhash n=$n windowstar")(TextOps.simhashBandDupIds(fp, bandBits).count())
      corpus.unpersist()
    }

    // ---- deep-hot refinement: occupancy-scaled width vs the old fixed 8 ----
    // One coarse bucket ~780× over cap — the r13 ADVICE scenario (occupancy
    // far beyond cap·2^8, where the old fixed-8 split leaves every subbucket
    // still ~3× over cap). Content is DIVERSE (deterministic sin-derived
    // vectors), so refinement can split; the guard's occupancy-scaled width
    // (ceilLog2(⌈occ/cap⌉)+2 → 12 bits here, 16-bit clamp) should cut
    // candidate pairs ~2^4 vs maxRefinePlanes=8 at the same wall-time
    // order. Bit-identical mass is the other, unsplittable pathology —
    // measured by the simhash hot-digest section above, owned by the
    // digest-grain dedup path.
    val m = 100000
    // hash-derived components (NOT sin-derived: the hyperplane family is
    // sin-based, and a sin-derived fixture correlates with it — measured
    // 3.5× over-uniform bucket skew before the switch)
    val deep = spark.range(m).select(
      col("id").as("cid"),
      array((0 until 16).map(d =>
        (pmod(xxhash64(col("id") * 16 + d), lit(20001)).cast("double") / 10000.0 - 1.0)
          .cast("float")): _*).as("ce"))
      .withColumn("sig", lit(0L))
      .repartition(spark.sparkContext.defaultParallelism).persist()
    deep.count()
    val deepProbes = deep.select(col("sig"), col("cid").as("qid"), col("ce").as("qe"))
    for (bits <- Seq(8, 16)) {
      time(s"deep-hot m=$m cap=128 maxRefine=$bits")(
        Similarity.guardedSigJoin(deep.select(col("sig"), col("cid"), col("ce")),
          "ce", deepProbes, "qe", cap = 128, maxRefinePlanes = bits).count())
    }
    deep.unpersist()
    spark.stop()
  }
}
