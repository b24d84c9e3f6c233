package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench outlier-recheck reads previous per-query mins from the newest
  * committed BENCH_r*.json — which is the DRIVER's wrapper with the metric
  * line escaped inside a `tail` field truncated to its last ~2000 chars.
  * Rounds 10-11 lost the `"queries":{` anchor to that truncation and the
  * recheck silently never fired; the parse must therefore be anchor-free.
  */
class BenchRefMinsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  private val known = Set("q_agg_join", "q_events_hourly", "q_dml_update", "q_scan")

  test("driver-truncated tail (no queries anchor) still yields per-query mins") {
    // mimic the real artifact: escaped quotes, head of the metric line cut
    // off mid-pair, trailing sbt noise after the closing brace
    val tail =
      """1,\"q_agg_join\":0.123,\"q_events_hourly\":0.968,\"q_dml_update\":0.499,""" +
        """\"write_sec\":5.062,\"loadavg_before\":\"1.42 2.00 2.45\",""" +
        """\"outliers_rechecked\":0,\"sf\":\"/root/testdata/sf0.1\"}\n[success] Total time: 204 s"""
    val artifact = s"""{"n":12,"rc":0,"cpus":32,"sf":"0.1","tail":"$tail","parsed":null}"""
    val mins = Bench.parseRefMins(artifact, sf, known)
    assert(mins === Map(
      "q_agg_join" -> 0.123, "q_events_hourly" -> 0.968, "q_dml_update" -> 0.499))
  }

  test("unknown q_-prefixed names and non-query fields are excluded") {
    val text = """\"q_agg_join\":0.2,\"q_removed_query\":9.9,\"write_sec\":5.0,\"sf\":\"/root/testdata/sf0.1\""""
    val mins = Bench.parseRefMins(text, sf, known)
    assert(mins === Map("q_agg_join" -> 0.2))
  }

  test("different-scale reference yields no baseline (no cross-sf rechecks)") {
    val text = """\"q_agg_join\":0.2,\"sf\":\"/root/testdata/sf0.01\""""
    assert(Bench.parseRefMins(text, sf, known).isEmpty)
  }

  test("raw bench_out.json (unescaped, untruncated) parses identically") {
    val line =
      s"""{"metric":"total","value":1.0,"unit":"sec","queries":{"q_agg_join":0.111,"q_scan":0.050},"write_sec":5.0,"sf":"$sf"}"""
    assert(Bench.parseRefMins(line, sf, known) ===
      Map("q_agg_join" -> 0.111, "q_scan" -> 0.05))
  }

  test("the real committed artifact, if present, parses non-empty at its own sf") {
    val dir = new java.io.File("/root/repo")
    val refFile = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("BENCH_r\\d+\\.json")).sortBy(_.getName).lastOption
    refFile.foreach { f =>
      val src = scala.io.Source.fromFile(f)
      val text = try src.mkString finally src.close()
      // the artifact's own sf string (unescape first; take the last match)
      val sfOwn = "\"sf\":\"([^\"]+)\"".r
        .findAllMatchIn(text.replace("\\\"", "\"")).map(_.group(1)).toSeq.lastOption
      sfOwn.foreach { s =>
        val mins = Bench.parseRefMins(text, s, SparkEntry.queries.keySet)
        assert(mins.nonEmpty, s"expected per-query mins from ${f.getName}")
      }
    }
  }
}
