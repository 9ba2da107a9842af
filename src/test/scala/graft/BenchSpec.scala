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
    // worst case: every query at 99.99 s (3 int digits after 1-dp
    // rounding) AND every query retimed — the full-map ladder steps
    // can never fit, so the capped block must bound the line
    val timings = names.map(n => (n, 99.99))
    val retimed = names.map(n => (n, 88.88))
    val blockAtCap = "\"" + ("x" * 290) + "\":1" // 296 chars, inside the 300 cap
    val line = Bench.compactHeadline(
      total = 9999.999, sfDir = "/root/testdata/sf0.1",
      timings = timings, nErr = 3, retimed0 = retimed,
      budgets = Map.empty, errKept = blockAtCap)
    assert(line.length + 1 <= 2000,
      s"headline is ${line.length} chars for ${names.size} queries — driver tail would truncate it")
    // the line must still carry one value per query (the point of the ladder)
    val vals = line.substring(line.indexOf("\"queries\":[") + "\"queries\":[".length,
                              line.lastIndexOf("]"))
    assert(vals.split(",").length == names.size)
  }

  test("headline under typical timings keeps 2-decimal precision and the retimed block") {
    val timings = names.map(n => (n, 1.23))
    val line = Bench.compactHeadline(8.0, "/sf", timings, 0, Seq.empty, Map.empty, "")
    assert(line.contains("1.23") || line.contains("1.2"),
      "expected at least 1-dp per-query precision at the current query count")
    assert(line.length + 1 <= 2000)
  }

  private def rtBody(line: String): String = {
    val rtBlock = line.substring(line.indexOf("\"retimed\":{") + "\"retimed\":".length)
    rtBlock.substring(1, rtBlock.indexOf("}"))
  }

  test("a moderate retime count rides COMPLETE at 2-dp in the headline map") {
    val timings = names.map(n => (n, 1.23))
    val retimed = names.sorted.take(20).map(n => (n, 17.89))
    val line = Bench.compactHeadline(400.0, "/root/testdata/sf0.1",
      timings, 0, retimed, Map.empty, "")
    assert(line.length + 1 <= 2000, s"headline is ${line.length} chars")
    val body = rtBody(line)
    assert(body.split(",").count(_.nonEmpty) == retimed.size,
      s"expected all ${retimed.size} retimes in the headline map")
    assert(body.contains(":17.89"), "2-dp retime values expected")
    // index keys (if the ladder chose them) must re-map via name-asc order
    if (line.contains("\"rtkeys\":\"ix\"")) {
      val sortedNames = names.sorted
      val ks = body.split(",").map(_.split(":")(0).replace("\"", "").toInt)
      assert(ks.map(sortedNames(_)).toSet == retimed.map(_._1).toSet)
    }
  }

  test("an r13-scale retime storm still leaves every effective value and index in the line") {
    // 84 retimes (the r13 capture gap): the full 2-dp map cannot fit
    // beside 303 query values, but the queries array IS effective-min
    // and rtix must then mark every retimed position — nothing about
    // the effective comparison may depend on the wiped target/bench.json
    val timings = names.map(n => (n, 5.67))
    val retimed = names.sorted.zipWithIndex.collect {
      case (n, i) if i % 4 == 0 => (n, 1.01) }
    val line = Bench.compactHeadline(1700.0, "/root/testdata/sf0.1",
      timings, 0, retimed, Map.empty, "")
    assert(line.length + 1 <= 2000, s"headline is ${line.length} chars")
    assert(line.contains("\"queries_are\":\"effective-min\""))
    assert(line.contains(s""""n_retimed":${retimed.size}"""))
    // effective values: every retimed position shows the min (1.0/1.01),
    // non-retimed the raw 5.67 (at whatever precision survived)
    val vals = line.substring(line.indexOf("\"queries\":[") + "\"queries\":[".length,
                              line.lastIndexOf("]")).split(",")
    assert(vals.length == names.size)
    val retIx = retimed.map(kv => names.sorted.indexOf(kv._1)).toSet
    retIx.foreach(i => assert(vals(i).toDouble < 1.5, s"ix $i not effective: ${vals(i)}"))
    // membership: either the map is complete or rtix lists every index
    val mapComplete = rtBody(line).split(",").count(_.nonEmpty) == retimed.size
    val ixBlock = line.substring(line.indexOf("\"rtix\":[") + "\"rtix\":[".length)
    val ixs = ixBlock.substring(0, ixBlock.indexOf("]")).split(",").filter(_.nonEmpty).map(_.toInt).toSet
    assert(mapComplete || ixs == retIx,
      "neither a complete retimed map nor a complete rtix survived")
  }
}
