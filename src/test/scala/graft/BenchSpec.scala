package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.renderLine's degradation ladder: the driver keeps only a
  * ~2000-char tail of stdout, so the handshake line must fit whole no
  * matter how many queries (or failures) the suite grows. Pure — no
  * SparkSession.
  */
class BenchSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def parse(line: String) = mapper.readTree(line)

  // realistic key length (the real suite's keys average ~12 chars)
  private def synthetic(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q_syn_$i%03d", i * 0.137))

  test("89-query-scale map renders at 2 decimals and fits") {
    val t = synthetic(89)
    val line = Bench.renderLine(t, t.map(_._2).sum, Nil, "/root/testdata/sf0.1")
    assert(line.length <= 1950)
    val js = parse(line)
    assert(js.get("queries").size() === 89)
    // 2-decimal rung: values carry centisecond precision
    assert(js.get("queries").get("q_syn_003").asDouble() === 0.41)
    assert(!js.has("failed") && !js.has("queries_omitted"))
  }

  test("synthetic 120-query map still fits the tail window and parses") {
    val t = synthetic(120)
    val line = Bench.renderLine(t, t.map(_._2).sum, Nil, "/root/testdata/sf0.1")
    assert(line.length <= 1950, s"line overflows: ${line.length}")
    val js = parse(line)
    assert(js.get("metric").asText() === "total")
    assert(math.abs(js.get("value").asDouble() - t.map(_._2).sum) < 0.1)
    val kept = js.get("queries").size()
    val omitted = if (js.has("queries_omitted")) js.get("queries_omitted").asInt() else 0
    assert(kept + omitted === 120)
    // when the map is truncated it keeps the SLOWEST queries — the
    // informative tail for a consumer diffing run-over-run
    if (omitted > 0)
      assert(js.get("queries").has("q_syn_120"))
  }

  test("sf shortens to its basename before any query is dropped") {
    // sweep the sizes around the real suite's: wherever the full-path
    // render overflows, the basename rung must absorb it first — a
    // query row only drops once even the short form cannot fit
    for (n <- 80 to 130) {
      val t = synthetic(n)
      val line = Bench.renderLine(t, t.map(_._2).sum, Nil, "/root/testdata/sf0.1")
      assert(line.length <= 1950, s"n=$n overflows: ${line.length}")
      val js = parse(line)
      val kept = js.get("queries").size()
      val omitted = if (js.has("queries_omitted")) js.get("queries_omitted").asInt() else 0
      assert(kept + omitted === n)
      if (omitted > 0)
        assert(js.get("sf").asText() === "sf0.1",
          s"n=$n dropped queries while sf still carried the full path")
    }
  }

  test("failed queries are named but never appear in the queries map") {
    val t = synthetic(20)
    val line = Bench.renderLine(t, t.map(_._2).sum,
      Seq("q_broken_a", "q_broken_b"), "/tmp/sf")
    val js = parse(line)
    assert(js.get("queries").size() === 20)
    assert(!js.get("queries").has("q_broken_a"))
    val failed = (0 until js.get("failed").size()).map(js.get("failed").get(_).asText())
    assert(failed === Seq("q_broken_a", "q_broken_b"))
  }

  test("mass failure truncates the failed list instead of overflowing") {
    val t = synthetic(100)
    val failed = (1 to 60).map(i => f"q_persistently_broken_query_$i%02d")
    val line = Bench.renderLine(t, t.map(_._2).sum, failed, "/root/testdata/sf0.1")
    assert(line.length <= 1950, s"line overflows: ${line.length}")
    val js = parse(line)
    val names = (0 until js.get("failed").size()).map(js.get("failed").get(_).asText())
    assert(names.take(8) === failed.take(8))
    assert(names.last === "+52 more")
  }

  test("total survives every rung at the requested precision") {
    val t = synthetic(120)
    val total = t.map(_._2).sum
    val line = Bench.renderLine(t, total, Nil, "/x", limit = 600)
    assert(line.length <= 600)
    assert(math.abs(parse(line).get("value").asDouble() - total) < 0.1)
  }
}
