package graft

/** Pure report-line construction for [[Bench]], factored out so the length
  * bounds are unit-testable without a SparkSession.
  *
  * The driver captures only the LAST 2,000 characters of Bench's stdout and
  * parses the last complete JSON line it finds there. Rounds 1-4 lost their
  * bench signal to an `[info]` prefix; round 9 lost it again when the compact
  * summary line grew past the window (130 per-query times at millisecond
  * precision PLUS two retry lists carried as arrays of full query names).
  * Everything here exists to make that failure class structurally impossible:
  *
  *   - the FULL line (millisecond times, full query names in the retry lists,
  *     error strings, full sf path) is printed first and persisted to
  *     `bench_out.json` — nothing is lost, it is just not the parse target;
  *   - the COMPACT line is printed last and is the parse target. Its
  *     `queries` map uses q-prefix-stripped keys ("114" for q114_…) and
  *     integer CENTISECOND values (self-described by `"queries_unit"`), the
  *     retry lists collapse to counts, and `sf` is a basename;
  *   - [[compactLine]] enforces a hard budget: if the rendered line would
  *     exceed [[CompactBudget]] it rebuilds keeping only the slowest
  *     [[TruncKeep]] queries and reports `"q_omitted"` — a degraded map is
  *     recoverable from bench_out.json, an unparsable line is a dark round.
  *
  * Retry categories (4th field of each result tuple):
  *   0 = not retried; 1 = stall clipped (rerun ≥2x faster — a microVM freeze
  *   was caught); 2 = slow confirmed (rerun reproduced the time); 3 = rerun
  *   ERRORED (proved nothing — per ADVICE r9 this must not hide in the
  *   stall bucket, so it is its own count: `retry_errors`).
  */
object BenchReport {
  /** (name, seconds, error, retryCategory) */
  type QRes = (String, Double, Option[String], Int)

  /** Hard ceiling for the compact line, below the driver's 2,000-char tail
    * window with margin for the trailing newline and a few extra digits. */
  val CompactBudget = 1900
  /** Slowest-N queries kept in the map when the budget forces truncation. */
  val TruncKeep = 60

  /** The checksum action both Bench and the q132 profiler time: force every
    * output column (a bare count() lets column pruning delete the very
    * expressions under test) and fold per-row xxhash64 with bit_xor — NOT
    * sum, which overflows the full Long range under ANSI mode and aborts
    * the job. One definition so the two measurements can never
    * desynchronize. */
  def checksummed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
    df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
      .agg(bit_xor(col("h")))
  }

  /** Benchmark-relation queries whose cost IS deliberate repeated work
    * (q131 runs five sf-scale scenario writes plus a warm-up slice, q132
    * re-executes a query trio twice).
    * They exceed any median-based trigger every round by construction, so a
    * retry proves nothing about host stalls and just doubles their cost —
    * exempt. */
  val retryExempt: Set[String] = Set("q131_etl_benchmark", "q132_warm_cold_profile")

  /** Retry trigger. r9 used `t > 3s && t > 4x median`, which let q49 regress
    * 5.3x (0.51s -> 2.68s) invisibly under the absolute floor; the floor is
    * now 1s so any many-fold regression of a sub-second query gets a rerun. */
  def shouldRetry(seconds: Double, median: Double): Boolean =
    seconds > 1.0 && seconds > 4.0 * median

  /** Classify a completed retry. `coldS`/`coldErr` from the first pass
    * (which succeeded — only error-free queries are retried), `rerun` the
    * second measurement. Returns the result tuple to report. */
  def classifyRetry(name: String, coldS: Double, rerun: (Double, Option[String])): QRes =
    rerun match {
      case (t2, None) =>
        // faster-of-two, and the category records whether the rerun exposed
        // a clipped stall (>=2x faster) or confirmed a genuinely slow query
        (name, math.min(coldS, t2), None, if (coldS >= 2.0 * t2) 1 else 2)
      case (_, Some(_)) =>
        // an errored rerun proved nothing about the cold time: keep the
        // valid cold measurement, flag the retry as errored (category 3)
        (name, coldS, None, 3)
    }

  private def esc(s: String): String = s.replace("\\", "/").replace("\"", "'")

  /** "q114_dedup_survivorship" -> "q114" (full-line short key). */
  private def shortKey(name: String): String = name.takeWhile(_ != '_')
  /** "q114_dedup_survivorship" -> "114" (compact-line key). */
  private def numKey(name: String): String = shortKey(name).stripPrefix("q")

  def fullLine(results: Seq[QRes], sfDir: String, calibBefore: Double, calibAfter: Double): String = {
    val failed = results.filter(_._3.isDefined)
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errs = failed.map { case (k, _, e, _) => "\"" + k + "\":\"" + esc(e.get) + "\"" }
      .mkString("{", ",", "}")
    val names = (cat: Int) => results.filter(_._4 == cat).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val calib = f""""calib_before_s":$calibBefore%.3f,"calib_after_s":$calibAfter%.3f"""
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.size},"errors":$errs,"stall_retries":${names(1)},"slow_confirmed":${names(2)},"retry_errors":${names(3)},$calib}"""
  }

  /** The parse-target line. Always valid JSON, always under [[CompactBudget]]. */
  def compactLine(results: Seq[QRes], sfDir: String, calibBefore: Double, calibAfter: Double): String = {
    val unabridged = render(results, omitted = 0, sfDir, calibBefore, calibAfter)
    if (unabridged.length <= CompactBudget) unabridged
    else {
      val keep = results.sortBy(-_._2).take(TruncKeep)
      render(keep, omitted = results.size - keep.size, sfDir, calibBefore, calibAfter,
        totalOverride = Some(results.map(_._2).sum), nOverride = Some(results.size),
        counts = Some((results.count(_._4 == 1), results.count(_._4 == 2),
          results.count(_._4 == 3), results.count(_._3.isDefined))))
    }
  }

  private def render(rs: Seq[QRes], omitted: Int, sfDir: String,
      calibBefore: Double, calibAfter: Double,
      totalOverride: Option[Double] = None, nOverride: Option[Int] = None,
      counts: Option[(Int, Int, Int, Int)] = None): String = {
    val qs = rs.map { case (k, v, _, _) => "\"" + numKey(k) + "\":" + math.round(v * 100) }
      .mkString("{", ",", "}")
    val total = math.round(totalOverride.getOrElse(rs.map(_._2).sum) * 1000) / 1000.0
    val n = nOverride.getOrElse(rs.size)
    val (sr, sc, re, nf) = counts.getOrElse(
      (rs.count(_._4 == 1), rs.count(_._4 == 2), rs.count(_._4 == 3), rs.count(_._3.isDefined)))
    val sf = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val omit = if (omitted > 0) s""","q_omitted":$omitted""" else ""
    val calib = f""""calib_s":[$calibBefore%.2f,$calibAfter%.2f]"""
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_unit":"centisec","sf":"$sf","failed":$nf,"n_queries":$n,"stall_retries":$sr,"slow_confirmed":$sc,"retry_errors":$re$omit,$calib}"""
  }
}
