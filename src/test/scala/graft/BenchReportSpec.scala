package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the Bench emission contract that rounds 1-4 and round 9 each lost a
  * full round of bench signal to: the LAST stdout line must be complete JSON
  * that fits whole inside the driver's 2,000-character tail window. No
  * SparkSession needed — BenchReport is pure. */
class BenchReportSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private def parse(line: String) = mapper.readTree(line)

  /** r8-distribution-ish times: mostly sub-second, a 3-8s tail. */
  private def mkResults(n: Int): Seq[BenchReport.QRes] =
    (1 to n).map { i =>
      val t = (i % 10) match {
        case 0 => 7.621; case 9 => 3.452; case 8 => 2.085; case _ => 0.4 + (i % 7) * 0.23
      }
      (f"q$i%02d_some_longer_query_name", t, None, i % 13 match { case 0 => 1; case 7 => 2; case _ => 0 })
    }

  test("compact line for the REAL current suite stays under 1800 chars") {
    // headroom canary under the 1,900 enforced budget: ~11 chars/query, so
    // 1800 trips around 168 queries — early warning before the slowest-N
    // truncation (itself tested below) would engage. History: r11 (140
    // queries) measured 1501; r15 (160 queries) tripped the old 1700 bound
    // at 1701 with uniform 123-cs values while the real r15 bench line
    // measured 1617 (real values are mostly 2-3 digit centiseconds) — the
    // canary re-verified, not a parse hazard. Next trip: re-check the real
    // line length against CompactBudget before raising again.
    val rs = SparkEntry.queries.keys.toSeq.sorted.map(n => (n, 1.234, None, 0): BenchReport.QRes)
    val line = BenchReport.compactLine(rs, "/root/testdata/sf0.1", 0.342, 0.339)
    assert(line.length < 1800, s"compact line ${line.length} chars for ${rs.size} queries:\n$line")
    val j = parse(line)
    assert(j.get("queries").size() === rs.size)
    assert(j.get("n_queries").asInt === rs.size)
    assert(j.get("queries_unit").asText === "centisec")
  }

  test("a 200-query summary still fits the 2KB tail window") {
    val line = BenchReport.compactLine(mkResults(200), "/root/testdata/sf0.1", 0.3, 0.3)
    assert(line.length <= BenchReport.CompactBudget, s"${line.length} chars")
    val j = parse(line)
    assert(j.get("n_queries").asInt === 200)
    // centisecond values round-trip: q10 ran 7.621s -> 762
    assert(j.get("queries").get("10").asInt === 762)
  }

  test("pathological query counts degrade to slowest-N + q_omitted, never overflow") {
    val rs = mkResults(400)
    val line = BenchReport.compactLine(rs, "/root/testdata/sf0.1", 0.3, 0.3)
    assert(line.length <= BenchReport.CompactBudget, s"${line.length} chars")
    val j = parse(line)
    assert(j.get("queries").size() === BenchReport.TruncKeep)
    assert(j.get("q_omitted").asInt === 400 - BenchReport.TruncKeep)
    // total and counts still describe the FULL suite, not the kept subset
    assert(j.get("n_queries").asInt === 400)
    assert(math.abs(j.get("value").asDouble - rs.map(_._2).sum) < 0.01)
  }

  test("full line carries full names, retry lists and errors") {
    val rs: Seq[BenchReport.QRes] = Seq(
      ("q01_ok", 0.5, None, 0),
      ("q02_stalled", 1.2, None, 1),
      ("q03_slow", 3.3, None, 2),
      ("q04_retry_err", 4.4, None, 3),
      ("q05_fail", 0.1, Some("boom \"quoted\""), 0))
    val j = parse(BenchReport.fullLine(rs, "/root/testdata/sf0.1", 0.3, 0.3))
    assert(j.get("stall_retries").get(0).asText === "q02_stalled")
    assert(j.get("slow_confirmed").get(0).asText === "q03_slow")
    assert(j.get("retry_errors").get(0).asText === "q04_retry_err")
    assert(j.get("failed").asInt === 1)
    assert(j.get("errors").get("q05_fail").asText.contains("boom"))
  }

  test("retry trigger: no 3s blind spot; classification separates errored reruns") {
    // the r9 q49 case: 2.678s at a 0.505s median regressed 5.3x unretried
    assert(BenchReport.shouldRetry(2.678, 0.505))
    assert(!BenchReport.shouldRetry(0.9, 0.1))   // sub-1s never retried
    assert(!BenchReport.shouldRetry(2.0, 0.65))  // within 4x of median
    // rerun >=2x faster -> stall clipped, faster time kept
    assert(BenchReport.classifyRetry("q", 6.0, (2.0, None)) === (("q", 2.0, None, 1)))
    // rerun reproduced -> slow confirmed
    assert(BenchReport.classifyRetry("q", 3.5, (3.2, None)) === (("q", 3.2, None, 2)))
    // rerun errored -> category 3, valid cold measurement kept
    assert(BenchReport.classifyRetry("q", 3.5, (0.1, Some("err"))) === (("q", 3.5, None, 3)))
  }

  test("driver tail-window simulation: the last complete JSON line inside " +
      "the final 2000 chars of stdout parses and describes the whole suite") {
    // exactly what the driver does: keep the last 2000 chars of stdout,
    // find the last complete JSON line, json-parse it. Both failure modes
    // that cost past rounds — a prefix on the line (r1-4) and a compact
    // line longer than the window (r9) — would break this test.
    val rs = mkResults(150) // current suite + headroom
    val stdout = BenchReport.fullLine(rs, "/root/testdata/sf0.1", 0.342, 0.339) +
      "\n" + BenchReport.compactLine(rs, "/root/testdata/sf0.1", 0.342, 0.339) + "\n"
    val tail = stdout.takeRight(2000)
    val lastJson = tail.split('\n').filter(l => l.startsWith("{") && l.endsWith("}")).lastOption
    assert(lastJson.isDefined, s"no complete JSON line in the tail window:\n$tail")
    val j = parse(lastJson.get)
    assert(j.get("n_queries").asInt === 150)
    assert(j.get("metric").asText === "total")
  }

  test("benchmark-relation queries are retry-exempt and exist in the suite") {
    // the exemption names real queries: a rename would silently re-enable
    // the pointless (and expensive) retry of deliberate repeated work
    BenchReport.retryExempt.foreach(n =>
      assert(SparkEntry.queries.contains(n), s"retryExempt names unknown query $n"))
  }
}
