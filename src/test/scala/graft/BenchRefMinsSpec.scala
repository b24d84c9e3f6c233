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

  test("a 2000-char driver truncation of the real tail line keeps pairs AND sf") {
    // the r16 regression: the full metric line put col_bw after the
    // queries map and the driver's 2000-char tail window kept ZERO q_*
    // pairs. The tail line puts the map last (sf after it); simulate the
    // exact window — escaped quotes, trailing sbt noise — over the FULL
    // production query set and assert a usable baseline survives.
    val names = SparkEntry.queries.keySet.toSeq.sorted
    val results = names.zipWithIndex.map { case (n, i) => n -> (0.05 + i * 0.001) }
    val line = Bench.tailLine(results.map(_._2).sum, names.size,
      Bench.formatQueries(results), sf)
    val window = (line.replace("\"", "\\\"") +
      "\\n[success] Total time: 295 s (04:55), completed Aug 15, 2026, 10:07:47 PM\n\",\n  \"parsed\": null\n}")
      .takeRight(2000)
    val mins = Bench.parseRefMins(window, sf, names.toSet)
    assert(mins.size >= 40, s"expected >=40 surviving pairs, got ${mins.size}")
    // the sf marker sits AFTER the map, so it can never truncate away:
    // a cross-scale artifact must still gate to empty
    assert(Bench.parseRefMins(window, "/root/testdata/sf1", names.toSet).isEmpty)
  }

  test("the qv line reconstructs the COMPLETE battery from a 2000-char window") {
    // VERDICT r17 #6: the named map outgrows the driver's tail window at
    // ~87 queries. The final qv line (name-sorted values only) fits whole,
    // so the committed artifact carries every row without backfill.
    val names = SparkEntry.queries.keySet.toSeq.sorted
    val results = names.zipWithIndex.map { case (n, i) => n -> (0.05 + i * 0.001) }
    val full = Bench.tailLine(results.map(_._2).sum, names.size,
      Bench.formatQueries(results), sf) + "\n" +
      Bench.qvLine(results.map(_._2).sum, results, sf)
    val window = (full.replace("\"", "\\\"") +
      "\\n[success] Total time: 295 s\n\",\n  \"parsed\": null\n}").takeRight(2000)
    val mins = Bench.parseRefMins(window, sf, names.toSet)
    assert(mins.size == names.size,
      s"qv window must carry ALL ${names.size} rows, got ${mins.size}")
    results.foreach { case (n, v) =>
      assert(math.abs(mins(n) - v) < 0.0005, s"$n: ${mins(n)} vs $v")
    }
    // a battery whose query set changed (count mismatch) falls back to
    // the surviving named pairs instead of mis-zipping values to names
    val fewer = Bench.parseRefMins(window, sf, names.toSet - names.head)
    assert(!fewer.contains(names.head) || fewer(names.head) == results.head._2)
    // cross-scale still gates to empty
    assert(Bench.parseRefMins(window, "/root/testdata/sf1", names.toSet).isEmpty)
    // ADVICE r18: SAME count but a renamed query — the qh fingerprint
    // mismatches, so the positional zip is refused and the parse falls
    // back to the surviving named pairs (never values on wrong names)
    val renamed = names.toSet - names.head + (names.head + "_renamed")
    val fb = Bench.parseRefMins(window, sf, renamed)
    assert(!fb.contains(names.head + "_renamed"),
      "a renamed battery must not inherit the old battery's value by position")
    // and an artifact WITHOUT a qh (pre-r19) still count-gates as before
    val noQh = Bench.qvLine(1.0, results, sf).replaceAll(""","qh":"[0-9a-f]+"""", "")
    assert(Bench.parseRefMins(noQh, sf, names.toSet).size == names.size)
  }

  test("the merged final line parses whole-stdout AND from a 2000-char window") {
    // round 22: the LAST stdout line is the complete canonical battery
    // JSON (queries map + qv/qh/sf). Both consumers must work: a parser
    // over the full line sees the named map; the driver's bounded tail
    // window sees the complete qv vector even though the map's head clips.
    val names = SparkEntry.queries.keySet.toSeq.sorted
    val results = names.zipWithIndex.map { case (n, i) => n -> (0.05 + i * 0.001) }
    val line = Bench.finalLine(results.map(_._2).sum, results, sf)
    // shape: one object, metric first, queries map present, sf last
    assert(line.startsWith("""{"metric":"total","""))
    assert(line.contains(""""queries":{"""))
    assert(line.endsWith(s""""sf":"$sf"}"""))
    // balanced braces/quotes = parseable JSON (no JSON lib on the test
    // classpath; the driver uses a real parser)
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.count(_ == '"') % 2 == 0)
    // full-line parse yields every named pair
    val full = Bench.parseRefMins(line, sf, names.toSet)
    assert(full.size == names.size)
    // driver-truncated window still reconstructs the COMPLETE battery
    val window = (line.replace("\"", "\\\"") +
      "\\n[success] Total time: 295 s\n\",\n  \"parsed\": null\n}").takeRight(2000)
    val mins = Bench.parseRefMins(window, sf, names.toSet)
    assert(mins.size == names.size,
      s"merged-line window must carry ALL ${names.size} rows, got ${mins.size}")
    assert(Bench.parseRefMins(window, "/root/testdata/sf1", names.toSet).isEmpty)
  }

  test("a qh from a different artifact line cannot validate the parsed qv") {
    // ADVICE r19: qv and qh were matched independently over the whole
    // window, so a window mixing artifact lines could validate one
    // line's values with another line's fingerprint. Window shape: a
    // complete qv line from a RENAMED battery (its own, mismatching qh),
    // followed by a later line whose qv clipped off but whose qh — which
    // matches the current battery — survives in the tail. The zip must
    // refuse (fall back to named pairs → empty here), not adopt the
    // renamed battery's values under the stray matching fingerprint.
    val names = Set("q_x1", "q_x2")
    val line =
      s"""{"metric":"total","value":1.0,"unit":"sec","nq":2,"qv":"9.000,9.000","qh":"00000000","sf":"$sf"}"""
    val stray = s""","qh":"${Bench.querySetFingerprint(names)}","sf":"$sf"}"""
    assert(Bench.parseRefMins(line + "\\n" + stray, sf, names).isEmpty,
      "a stray same-window qh validated a different line's qv")
    // and the same-line qh still validates as before
    val good =
      s"""{"qv":"1.000,2.000","qh":"${Bench.querySetFingerprint(names)}","sf":"$sf"}"""
    assert(Bench.parseRefMins(good, sf, names) === Map("q_x1" -> 1.0, "q_x2" -> 2.0))
  }

  test("the production newest-first artifact walk yields per-query mins") {
    // BENCH_r16.json committed the broken col_bw-after-queries shape (its
    // tail has zero pairs), so the NEWEST artifact alone is not pinned —
    // this asserts what the bench actually relies on: the newest-first
    // walk over committed artifacts, with the bench_out.json backfill,
    // produces a non-empty recheck baseline. From r17 on the tail line
    // makes the newest artifact itself parse non-empty again.
    val dir = new java.io.File("/root/repo")
    def parse(f: java.io.File): Map[String, Double] =
      try {
        val src = scala.io.Source.fromFile(f)
        val text = try src.mkString finally src.close()
        val sfOwn = "\"sf\":\"([^\"]+)\"".r
          .findAllMatchIn(text.replace("\\\"", "\"")).map(_.group(1)).toSeq.lastOption
        sfOwn.map(s => Bench.parseRefMins(text, s, SparkEntry.queries.keySet))
          .getOrElse(Map.empty)
      } catch { case _: Throwable => Map.empty }
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("BENCH_r\\d+\\.json")).sortBy(_.getName).reverse
    if (files.nonEmpty) {
      val walked = files.view.map(parse).find(_.nonEmpty).getOrElse(Map.empty)
      val backfill = parse(new java.io.File(dir, "bench_out.json"))
      assert((backfill ++ walked).nonEmpty,
        "no committed bench artifact (nor bench_out.json) yields per-query mins")
    }
  }
}
