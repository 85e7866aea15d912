package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.flight.Flight
import graft.functions.HistogramAgg

/** End-to-end integration (SURVEY §5 integration tier): raw landing JSON →
  * explode/validate → enrich/categorize → partitioned parquet → read back →
  * aggregate, with the corrupt-file side channel exercised in the same run. */
class PipelineIntegrationSpec extends SparkSpecBase {
  import spark.implicits._

  test("raw JSON to partitioned parquet to analytics round-trip") {
    val landing = Files.createTempDirectory("e2e_landing")
    // two good batches (different hours) + one corrupt file
    def state(icao: String, alt: Double, vel: Double, ground: Boolean) =
      s"""["$icao", "CS$icao ", "US", 1, 2, -100.0, 40.0, $alt, $ground, $vel, 90.0, 1.0, null, $alt, "7000", false, 0]"""
    Files.writeString(landing.resolve("b1.json"),
      s"""{"time": 1704067200, "states": [${state("aaa111", 3000.0, 250.0, false)}, ${state("bbb222", 0.0, 2.0, true)}]}""")
    Files.writeString(landing.resolve("b2.json"),
      s"""{"time": 1704070800, "states": [${state("ccc333", 11000.0, 240.0, false)}]}""")
    Files.writeString(landing.resolve("broken.json"), """{"time": 99, "states": [[""")

    val (good, bad) = Flight.readRawWithErrors(spark, landing.toString)
    assert(bad.count() === 1)

    val enriched = Flight.ingest(spark, landing.toString)
    val out = Files.createTempDirectory("e2e_out").toString
    Flight.writePartitioned(enriched, out)

    val back = spark.read.parquet(out)
    assert(back.count() === 3)
    assert(back.select("hour").distinct().count() === 2) // two hourly partitions
    val phases = back.select("icao24", "flight_phase").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(phases("bbb222") === "GROUND") // on ground, slow
    // aaa111: 3000 m ≈ 9842 ft, 250 m/s ≈ 486 kn, no climb → cruise band
    assert(phases("aaa111") === "CRUISE")
    // analytics over the landed data: category distribution
    val cats = back.groupBy("altitude_category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cats.values.sum === 3)
  }

  test("typed HistogramAgg matches the DataFrame histogram on events.value") {
    val values = Tables.events(spark, Sf0001).select(col("value")).as[Double]
    val hist = values.select(HistogramAgg(0.0, 100.0, 10).toColumn).head()
    val viaDf = Tables.events(spark, Sf0001)
      .groupBy(floor(col("value") / 10).cast("int").as("b")).count()
      .collect().map(r => math.min(math.max(r.getInt(0), 0), 9) -> r.getLong(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(hist === viaDf)
  }
}
