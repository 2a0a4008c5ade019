package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's contended-run flag (r15, VERDICT r14 #2): the r14
  * driver bench printed `pipe_ann_ivfpq` at 19.6 s — 12.6× the quiet
  * value — and the spread rule passed it, because a uniformly contended
  * window inflates median and spread together. The min-vs-prior-median
  * band fires exactly there; these pins keep the rule and its reference
  * lookup honest.
  */
class BenchTrustSpec extends AnyFunSuite {

  test("contendedKey: fires on a uniformly hot sample, not on drift or tiny keys") {
    // the r14 artifact: quiet median 1.56 s, contended min far above 2x
    assert(Bench.contendedKey(minSec = 12.0, ref = 1.56))
    // ordinary box drift (+-20%) never fires
    assert(!Bench.contendedKey(minSec = 1.9, ref = 1.56))
    // exactly-2x does not fire (strict >)
    assert(!Bench.contendedKey(minSec = 3.12, ref = 1.56))
    // sub-100 ms keys need the absolute floor, not just the ratio: the
    // floor rides ON TOP of the doubling (min > 2*ref + 0.1), so a
    // 150 ms key at 0.32 s (mere jitter) stays quiet too
    assert(!Bench.contendedKey(minSec = 0.09, ref = 0.03))
    assert(!Bench.contendedKey(minSec = 0.32, ref = 0.15))
    assert(!Bench.contendedKey(minSec = 0.5, ref = 0.2)) // exactly at 2*ref+0.1
    assert(Bench.contendedKey(minSec = 0.51, ref = 0.2))
    // no reference (new key, or ref <= 0) never fires
    assert(!Bench.contendedKey(minSec = 99.0, ref = 0.0))
    assert(!Bench.contendedKey(minSec = 99.0, ref = -1.0))
  }

  test("contendedCalib: the calibration key trips on the modest uniform inflation") {
    // the r16 driver window: untouched keys at 1.28-1.37x — below the
    // workload keys' 2x rule, but the fixture-fixed CPU key (quiet cost
    // ~2 s) must flag that window
    assert(Bench.contendedCalib(minSec = 2.60, ref = 2.0)) // 1.30x fires
    assert(!Bench.contendedKey(minSec = 2.60, ref = 2.0),
      "workload rule correctly blind to 1.3x — that is the calib key's job")
    // ordinary jitter on the CPU constant stays quiet
    assert(!Bench.contendedCalib(minSec = 2.2, ref = 2.0))
    // exactly at 1.25*ref + 0.05 does not fire (strict >)
    assert(!Bench.contendedCalib(minSec = 2.55, ref = 2.0))
    assert(Bench.contendedCalib(minSec = 2.56, ref = 2.0))
    assert(!Bench.contendedCalib(minSec = 99.0, ref = 0.0))
  }

  test("referenceBand: newest matching-sf BENCH file wins; mismatch or garbage is empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft_band").toFile
    def write(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
      try w.print(body) finally w.close()
    }
    try {
      write("BENCH_r03.json",
        """{"metric":"total","value":9.9,"queries":{"q1_agg":0.9},"sf":"/d/sf0.1"}""")
      write("BENCH_r11.json",
        """{"metric":"total","value":5.0,"queries":{"q1_agg":0.25,"geo_sjoin":1.61},"sf":"/d/sf0.1"}""")
      val (ref, band) = Bench.referenceBand("/d/sf0.1", dir.toString)
      assert(ref === "BENCH_r11.json") // numeric round order, not lexicographic
      assert(band === Map("q1_agg" -> 0.25, "geo_sjoin" -> 1.61))
      // no file with a matching sf anywhere: no band — cross-sf medians
      // would flag everything or nothing
      val (ref2, band2) = Bench.referenceBand("/d/sf0.01", dir.toString)
      assert(ref2 === "" && band2.isEmpty)
      // an unparseable NEWEST file must not shadow an older matching
      // band (round-review finding: newest-then-match went silently
      // inert; the contract is newest MATCHING file) — and never throws
      write("BENCH_r12.json", "{not json")
      val (ref3, band3) = Bench.referenceBand("/d/sf0.1", dir.toString)
      assert(ref3 === "BENCH_r11.json" && band3.nonEmpty,
        s"unparseable newest file shadowed the older matching band: $ref3")
      // an absurd round number in a file name is skipped, not fatal
      write("BENCH_r99999999999.json", "{not json either")
      assert(Bench.referenceBand("/d/sf0.1", dir.toString)._1 === "BENCH_r11.json")
      // the DRIVER archive shape: a wrapper with the bench line buried
      // in the tail log (this is what BENCH_r*.json actually looks like
      // in the repo — the r14 files are wrappers, not raw bench output)
      write("BENCH_r13.json",
        """{"n":13,"rc":0,"cpus":32,"sf":0.1,"parsed":null,"tail":""" +
          "\"[error] noise line\\n" +
          """[info] {\"metric\":\"total\",\"value\":9.9,\"queries\":{\"q1_agg\":0.31,\"geo_sjoin\":1.7},\"sf\":\"/d/sf0.1\"}\n""" +
          "[error] trailing noise\"}")
      val (ref4, band4) = Bench.referenceBand("/d/sf0.1", dir.toString)
      assert(ref4 === "BENCH_r13.json", s"wrapper archive not unwrapped: $ref4")
      assert(band4 === Map("q1_agg" -> 0.31, "geo_sjoin" -> 1.7))
      // wrapper whose inner line is for another sf: no band
      assert(Bench.referenceBand("/d/sf0.01", dir.toString)._2.isEmpty)
      // the r15-r17 failure mode VERBATIM: the driver archive's tail is
      // truncated MID-metric-line, so unwrap finds no line and the file
      // must fall through to the older parseable band — not return empty
      // (this is the shape that silently knocked the reference back to
      // the pre-calibration r14 file for three rounds, VERDICT r17 #1)
      write("BENCH_r14.json",
        """{"n":14,"rc":0,"cpus":32,"sf":0.1,"parsed":null,"tail":""" +
          "\"etric\\\":\\\"total\\\",\\\"value\\\":9.9,\\\"sf\\\":\\\"/d/sf0.1\\\"}\\n" +
          "[error] noise\"}")
      val (ref5, band5) = Bench.referenceBand("/d/sf0.1", dir.toString)
      assert(ref5 === "BENCH_r13.json" && band5.nonEmpty,
        s"truncated-tail newest archive shadowed the older band: $ref5")
    } finally {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  test("bands file: preferred over archives, min-merged, never banded by a contended run") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bands").toFile
    def write(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
      try w.print(body) finally w.close()
    }
    try {
      // an archive exists, but once a bands file is stamped it must win:
      // the archive's tail can truncate (r15-r17), the local file cannot
      write("BENCH_r11.json",
        """{"metric":"total","value":5.0,"queries":{"q1_agg":0.30,"calib_cpu":0.40},"sf":"/d/sf0.1"}""")
      assert(Bench.referenceBand("/d/sf0.1", dir.toString)._1 === "BENCH_r11.json")
      // first run stamps its medians (errored keys, median -1, skipped)
      Bench.mergeBands("/d/sf0.1",
        Map("q1_agg" -> 0.25, "calib_cpu" -> 0.17, "broken" -> -1.0), dir.toString)
      val (ref1, band1) = Bench.referenceBand("/d/sf0.1", dir.toString)
      assert(ref1 === Bench.BandsFileName)
      assert(band1 === Map("q1_agg" -> 0.25, "calib_cpu" -> 0.17))
      // the calib floor is the stamped band: a 1.5x contended window
      // (the exact r17 readings, 0.249-0.28 vs floor ~0.17) now FIRES
      assert(Bench.contendedCalib(minSec = 0.28, ref = band1("calib_cpu")))
      // a CONTENDED second run (everything 1.6x) must not raise any band
      Bench.mergeBands("/d/sf0.1",
        Map("q1_agg" -> 0.40, "calib_cpu" -> 0.27), dir.toString)
      assert(Bench.readBands("/d/sf0.1", dir.toString) ===
        Map("q1_agg" -> 0.25, "calib_cpu" -> 0.17))
      // a quieter run lowers its keys and new keys join
      Bench.mergeBands("/d/sf0.1",
        Map("q1_agg" -> 0.22, "geo_sjoin" -> 1.5), dir.toString)
      assert(Bench.readBands("/d/sf0.1", dir.toString) ===
        Map("q1_agg" -> 0.22, "calib_cpu" -> 0.17, "geo_sjoin" -> 1.5))
      // other sf sections ride along untouched; lookups never cross sf
      Bench.mergeBands("/d/sf0.01", Map("q1_agg" -> 0.05), dir.toString)
      assert(Bench.readBands("/d/sf0.1", dir.toString)("q1_agg") === 0.22)
      assert(Bench.readBands("/d/sf0.01", dir.toString) === Map("q1_agg" -> 0.05))
      // sections are keyed by (sf, cpus): a run at a different
      // parallelism must NOT ratchet the default section's bands down
      // to minima the default config can never reach
      assert(Bench.bandKey("/d/sf0.1", "32") === "/d/sf0.1|cpus=32")
      assert(Bench.bandKey("/d/sf0.1", "") === "/d/sf0.1")
      Bench.mergeBands(Bench.bandKey("/d/sf0.1", "64"),
        Map("q1_agg" -> 0.01), dir.toString)
      assert(Bench.readBands("/d/sf0.1", dir.toString)("q1_agg") === 0.22,
        "a cpus=64 run leaked into the unkeyed section")
      assert(Bench.referenceBand("/d/sf0.1", dir.toString, cpus = "64")._2
        === Map("q1_agg" -> 0.01))
      // garbage bands file: lookup is empty and the archive fallback
      // returns; the next merge rebuilds from scratch instead of throwing
      write(Bench.BandsFileName, "{not json")
      assert(Bench.readBands("/d/sf0.1", dir.toString).isEmpty)
      assert(Bench.referenceBand("/d/sf0.1", dir.toString)._1 === "BENCH_r11.json")
      Bench.mergeBands("/d/sf0.1", Map("q1_agg" -> 0.3), dir.toString)
      assert(Bench.readBands("/d/sf0.1", dir.toString) === Map("q1_agg" -> 0.3))
      // section keys with JSON-hostile characters survive the round trip
      // (the writer renders through json4s, not string concatenation)
      val hostile = """C:\data\sf"0.1""""
      Bench.mergeBands(hostile, Map("q1_agg" -> 0.5), dir.toString)
      assert(Bench.readBands(hostile, dir.toString) === Map("q1_agg" -> 0.5))
      assert(Bench.readBands("/d/sf0.1", dir.toString) === Map("q1_agg" -> 0.3),
        "hostile section corrupted the file for other sections")
      // the ARCHIVE fallback is cpus-checked too: a cpus-stamped file
      // from a different parallelism must not become the reference (an
      // 8-cpu run against a 32-cpu band would flag nearly every key);
      // legacy files without the field are accepted
      new java.io.File(dir, Bench.BandsFileName).delete()
      write("BENCH_r12.json",
        """{"metric":"total","value":9.9,"queries":{"q1_agg":0.29},""" +
          """"cpus":"32","sf":"/d/sf0.1"}""")
      assert(Bench.referenceBand("/d/sf0.1", dir.toString, cpus = "8")._1
        === "BENCH_r11.json",
        "a 32-cpu archive served as the band for an 8-cpu run")
      assert(Bench.referenceBand("/d/sf0.1", dir.toString, cpus = "32")._1
        === "BENCH_r12.json")
      assert(Bench.referenceBand("/d/sf0.1", dir.toString)._1
        === "BENCH_r12.json", "no-cpus lookup must accept stamped files")
    } finally {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }
}
