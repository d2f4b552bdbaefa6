package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must never let a broken query masquerade as a fast
  * one: failures are recorded per query and counted in the JSON, and
  * timings are min-of-N over interleaved passes. */
class BenchSpec extends AnyFunSuite {

  test("timeQueries: a failing query lands in errors, not in times") {
    val (times, errors) = Bench.timeQueries(
      Seq("good", "bad"), reps = 2,
      name => if (name == "bad") throw new RuntimeException("boom!") else ())
    assert(times.contains("good"))
    assert(!times.contains("bad"))
    assert(errors.keySet == Set("bad"))
    assert(errors("bad").contains("boom!"))
  }

  test("timeQueries: min-of-N keeps the fastest rep") {
    var firstRun = true
    val (times, _) = Bench.timeQueries(Seq("q"), reps = 2, _ => {
      if (firstRun) { firstRun = false; Thread.sleep(150) }
    })
    assert(times("q") < 0.1,
      s"expected the fast second rep to win, got ${times("q")}s")
  }

  test("renderJson carries errors count and escaped messages") {
    val json = Bench.renderJson(
      Map("ok" -> 1.5),
      Map("bad" -> "java.lang.RuntimeException: \"quoted\"\nline2"),
      "/sf/dir")
    assert(json.contains("\"errors\":1"))
    assert(json.contains("\\\"quoted\\\""))
    assert(json.contains("\\n"))
    assert(json.contains("\"ok\":1.5"))
    // must stay one line for the driver's line-oriented capture
    assert(!json.contains('\n'.toString + "{") && json.linesIterator.size == 1)
  }

  test("renderJson with no errors reports zero") {
    val json = Bench.renderJson(Map("a" -> 0.5, "b" -> 1.0), Map(), "sf")
    assert(json.contains("\"errors\":0"))
    assert(json.contains("\"value\":1.5"))
  }
}
