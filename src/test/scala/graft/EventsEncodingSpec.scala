package graft

import org.apache.spark.sql.functions._

/** Loader robustness against driver regenerations of `events.parquet`.
  *
  * The physical `ts` encoding has CHANGED across regenerations —
  * TIMESTAMP(NANOS) through r5, TIMESTAMP(MICROS, NTZ) since r6 — and round
  * 6 lost 62 queries for a whole round to the drift. This spec pins
  * [[Tables.events]]/[[Tables.eventsInRange]] against committed fixture
  * files carrying the SAME instants in every encoding a producer has
  * shipped (plus the adjusted-to-UTC micros variant), without touching
  * /root/testdata:
  *
  *   - `events_enc/nanos`      — timestamp[ns]          (read long under
  *     the legacy nanosAsLong conf, the pre-r6 shape)
  *   - `events_enc/micros`     — timestamp[us, tz=UTC]  (TimestampType)
  *   - `events_enc/micros_ntz` — timestamp[us]          (TIMESTAMP_NTZ,
  *     the current driver shape)
  *
  * Each loader branch must produce identical (ts_ns, ts) and keep
  * time-range bounds on the RAW column so they reach PushedFilters.
  */
class EventsEncodingSpec extends SparkSpecBase {

  private val BaseS = 1700000000L
  private val AllSecs =
    Seq(0L, 600L, 1200L, 3600L, 3660L, 7200L, 7260L, 10800L).map(BaseS + _)

  private def fixtureDir(enc: String): String =
    new java.io.File(getClass.getClassLoader
      .getResource(s"events_enc/$enc/events.parquet").toURI)
      .getParentFile.getPath

  private val Encodings = Seq("nanos", "micros", "micros_ntz")

  test("Tables.events derives identical ts_ns and micro ts under every " +
      "shipped encoding") {
    val perEnc = Encodings.map { enc =>
      val df = Tables.events(spark, fixtureDir(enc))
      // both derived columns present with the contract types
      assert(df.schema("ts_ns").dataType ===
        org.apache.spark.sql.types.LongType, enc)
      assert(df.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType, enc)
      enc -> df.select(col("event_id"), col("ts_ns"),
          unix_micros(col("ts")).as("ts_us"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    }.toMap
    val expected = AllSecs.zipWithIndex.map { case (s, i) =>
      (i + 1L, s * 1000000000L, s * 1000000L)
    }
    Encodings.foreach { enc =>
      assert(perEnc(enc) === expected,
        s"$enc loader branch drifted from the instant contract")
    }
  }

  test("eventsInRange filters identically under every encoding and the " +
      "bound reaches PushedFilters on the raw ts column") {
    val fromS = BaseS + 3600L
    val untilS = BaseS + 7260L
    Encodings.foreach { enc =>
      val dir = fixtureDir(enc)
      val ranged = Tables.eventsInRange(spark, dir, Some(fromS), Some(untilS))
      // row-equivalent to the derived ts_ns filter over the full load
      val expectedIds = Tables.events(spark, dir)
        .filter(col("ts_ns") >= fromS * 1000000000L &&
          col("ts_ns") < untilS * 1000000000L)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      val gotIds = ranged.select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(gotIds === expectedIds && gotIds === Seq(4L, 5L, 6L), enc)
      // the bound must reach the scan: a filter on the DERIVED ts_ns never
      // pushes down, so the plan must show pushed ts predicates
      val plan = ranged.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:"), s"$enc:\n$plan")
      assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts".r
        .findFirstIn(plan).isDefined,
        s"$enc range bound did not push down:\n$plan")
    }
  }

  test("Tables.embeddings normalizes a float64 regeneration to the " +
      "array<float> contract every consumer assumes") {
    val dir = new java.io.File(getClass.getClassLoader
      .getResource("emb_enc/float64/embeddings.parquet").toURI)
      .getParentFile.getPath
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, true))
    // the getSeq[Float] probe-collect path (withMaxSimToProbes) must work
    val vecs = df.select(col("embedding")).collect()
      .map(_.getSeq[Float](0))
    assert(vecs.length === 6 && vecs.forall(_.length === 8))
    // and the native cosine kernel still runs over the normalized column
    graft.sim.Similarity.ensureRegistered(spark)
    val sims = df.select(graft.sim.Similarity
        .cosine(col("embedding"), col("embedding")).as("s"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-6))
  }
}
