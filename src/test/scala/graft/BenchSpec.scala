package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-contract stdout line: the driver keeps only the
  * LAST 2000 chars of Bench stdout and parses one JSON line from that
  * tail. The headline must therefore fit the window WITH all per-query
  * timings at the CURRENT query count — under worst-case digit widths
  * and fully-saturated retimed/error blocks, not just the timings a
  * quiet host happens to produce (r12's line fit only because most
  * queries were sub-second).
  */
class BenchSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq

  test("headline with every per-query timing fits the driver's 2000-char tail capture") {
    // worst-case digits: every query at 99.99 s (3 int digits after
    // 1-dp rounding), both bounded blocks at their 300-char caps
    val timings = names.map(n => (n, 99.99))
    val blockAtCap = "\"" + ("x" * 290) + "\":1" // 296 chars, inside the 300 cap
    val line = Bench.compactHeadline(
      total = 9999.999, sfDir = "/root/testdata/sf0.1",
      timings = timings, nErr = 3, rtC = "{" + blockAtCap + "}",
      errKept = blockAtCap)
    assert(line.length + 1 <= 2000,
      s"headline is ${line.length} chars for ${names.size} queries — driver tail would truncate it")
    // the line must still carry one value per query (the point of the ladder)
    val vals = line.substring(line.indexOf("\"queries\":[") + "\"queries\":[".length,
                              line.lastIndexOf("]"))
    assert(vals.split(",").length == names.size)
  }

  test("headline under typical timings keeps 2-decimal precision and the retimed block") {
    val timings = names.map(n => (n, 1.23))
    val line = Bench.compactHeadline(8.0, "/sf", timings, 0, "{}", "")
    assert(line.contains("1.23") || line.contains("1.2"),
      "expected at least 1-dp per-query precision at the current query count")
    assert(line.length + 1 <= 2000)
  }
}
