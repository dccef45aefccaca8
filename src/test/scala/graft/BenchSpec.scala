package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the bench output contract: the stdout line must ALWAYS
  * fit the driver's 2000-char tail-capture window (with headroom for
  * sbt's success trailer) and stay valid JSON, no matter how many
  * queries the suite grows to — round 2 lost its official perf number
  * to exactly this (full-precision line truncated by the tail window).
  * The file line keeps full precision for every query.
  */
class BenchSpec extends AnyFunSuite {
  private val om = new ObjectMapper()

  test("stdout line fits the tail window even with 200 long-named queries") {
    val timings = (0 until 200).map(i =>
      (f"very_long_query_name_number_$i%03d", i * 0.123456789))
    val maxes = timings.map { case (k, v) => (k, v * 2) }
    val (fileLine, stdoutLine) =
      Bench.renderLines(timings, maxes, Nil, "/root/testdata/sf0.1")
    assert(stdoutLine.length <= Bench.StdoutBudget)
    val parsed = om.readTree(stdoutLine)
    assert(parsed.get("n_queries").asInt == 200)
    assert(parsed.get("queries_omitted").asInt > 0)
    // truncation keeps the SLOWEST queries (the ones worth reading)
    assert(parsed.get("queries").has("very_long_query_name_number_199"))
    assert(!parsed.get("queries").has("very_long_query_name_number_000"))
    // run spread lives in the file artifact only — never on stdout
    assert(parsed.get("queries_max") == null)
    // the file artifact keeps everything at full precision
    val full = om.readTree(fileLine)
    assert(full.get("queries").size == 200)
    assert(full.get("queries").get("very_long_query_name_number_001").asDouble
      == 0.123456789)
    assert(full.get("queries_max").size == 200)
    assert(full.get("queries_max").get("very_long_query_name_number_001")
      .asDouble == 2 * 0.123456789)
  }

  test("small result: no truncation, compact rounding, errors carried") {
    val (fileLine, stdoutLine) = Bench.renderLines(
      Seq("a" -> 1.234567), Seq("a" -> 1.9),
      Seq("b" -> "boom: \"quoted\"\nline2"), "sf")
    for (line <- Seq(fileLine, stdoutLine)) {
      val p = om.readTree(line)
      assert(p.get("n_queries").asInt == 2)
      assert(p.get("n_failed").asInt == 1)
      assert(p.get("errors").get("b").asText.startsWith("boom"))
      assert(p.get("queries_omitted") == null)
    }
    assert(om.readTree(stdoutLine).get("queries").get("a").asDouble == 1.23)
    assert(om.readTree(fileLine).get("queries").get("a").asDouble == 1.234567)
  }

  test("verbose failures cannot blow the stdout budget") {
    // 50 failing queries with 300-char messages: stdout caps each message
    // at 80 chars, and if even the 1-query line doesn't fit it drops the
    // errors map with an errors_omitted count. bench.json keeps the full
    // messages either way.
    val errors = (0 until 50).map(i =>
      (f"failing_query_$i%02d", "x" * 300))
    val timings = Seq("ok_query" -> 1.0)
    val (fileLine, stdoutLine) =
      Bench.renderLines(timings, timings, errors, "sf")
    assert(stdoutLine.length <= Bench.StdoutBudget)
    val p = om.readTree(stdoutLine)
    assert(p.get("n_failed").asInt == 50)
    assert(p.get("errors_omitted").asInt == 50)
    val full = om.readTree(fileLine)
    assert(full.get("errors").get("failing_query_00").asText == "x" * 300)

    // a handful of failures: messages survive on stdout, capped at 80
    val (_, line2) =
      Bench.renderLines(timings, timings, Seq("b" -> ("y" * 300)), "sf")
    assert(line2.length <= Bench.StdoutBudget)
    assert(om.readTree(line2).get("errors").get("b").asText == "y" * 80)
  }
}
