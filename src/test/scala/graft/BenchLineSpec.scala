package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout line is the driver's ONLY reliable channel (its
  * collector keeps a ~2000-char tail window) — these pin the curated
  * headline's hard budget and its content contract at suite sizes well
  * past the current query count.
  */
class BenchLineSpec extends AnyFunSuite {

  private def fakeSuite(n: Int): Map[String, Double] =
    (1 to n).map(i => f"q_some_operator_with_a_long_name_$i%03d" -> i * 0.037).toMap

  test("headline stays under budget at 200 and 2000 queries, slowest entries survive") {
    for (n <- Seq(5, 132, 200, 2000)) {
      val mins = fakeSuite(n)
      val line = Bench.headline(mins, "/root/testdata/sf0.1", suspect = n % 2 == 0)
      assert(line.length < 1500, s"n=$n line is ${line.length} chars")
      // the most expensive query always survives curation
      val top = mins.maxBy(_._2)._1
      assert(line.contains("\"" + top + "\":"), s"n=$n slowest query missing from line")
      // scalar tail fields: value last, sf before it — a tail-window cut
      // takes queries first
      assert(line.matches(""".*"sf":"[^"]*","value":[0-9.]+}$"""), line.takeRight(80))
      assert(line.contains(s""""n_queries":$n,"""))
      if (n > Bench.MaxEntries)
        assert(line.contains(s""""elided":${n - Bench.MaxEntries},"""),
          s"n=$n elided count must be explicit")
    }
  }

  test("headline is valid JSON with value == rounded sum over the full suite") {
    val mins = fakeSuite(137)
    val line = Bench.headline(mins, "/root/testdata/sf0.1", suspect = true)
    // minimal JSON sanity without a parser dependency: balanced braces,
    // suspect flag present, total equals the rounded sum
    assert(line.count(_ == '{') == 2 && line.count(_ == '}') == 2)
    assert(line.contains(""""suspect":true,"""))
    val expected = mins.values.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble).sum
    val got = """"value":([0-9.]+)}""".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(got - expected) < 0.011, s"$got vs $expected")
    // empty suite never divides by zero or emits a malformed map
    val empty = Bench.headline(Map.empty, "/x", suspect = false)
    assert(empty.contains(""""queries":{},""") && empty.endsWith(""""value":0.00}"""))
  }
}
