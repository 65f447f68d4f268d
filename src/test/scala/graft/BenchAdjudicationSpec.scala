package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the bench record's self-adjudication layer (r18 VERDICT
  * item 1) and the measured-scan-class listener (item 2): the per-round
  * BENCH_r{N}.json must be readable standalone — a judge classifies a
  * contended-host sample from the record's own fields, without PLANS/
  * commit archaeology — and roll updates must freeze under non-default
  * execution configs (ADVICE r18: one throughput-favorable run would
  * otherwise poison the rolling records forever).
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  test("verdictLine: clean sample when probes flat and shift small") {
    assert(Bench.verdictLine(fullBoard = true, nQueries = 219,
      cfgDefault = true, flat = true, shift = 1.05, probeMin = 0.4,
      probeMax = 0.45, quietBest = 94.3) == "clean sample")
  }

  test("verdictLine: contended sample names the probe swing and quiet best") {
    val v = Bench.verdictLine(fullBoard = true, nQueries = 219,
      cfgDefault = true, flat = false, shift = 1.499, probeMin = 0.44,
      probeMax = 0.76, quietBest = 94.3)
    assert(v.contains("contended-host sample"))
    assert(v.contains("0.44-0.76s"))
    assert(v.contains("quiet same-commit best 94.3s"))
  }

  test("verdictLine: contended flat-probe sample cites the shift; no quiet sample is said so") {
    val v = Bench.verdictLine(fullBoard = true, nQueries = 219,
      cfgDefault = true, flat = true, shift = 1.6, probeMin = 0.4,
      probeMax = 0.42, quietBest = -1.0)
    assert(v.contains("global_shift 1.60x"))
    assert(v.contains("no quiet same-commit sample"))
  }

  test("verdictLine: partial and non-default-config runs are labeled, never 'clean sample'") {
    assert(Bench.verdictLine(fullBoard = false, nQueries = 12,
      cfgDefault = true, flat = true, shift = 1.0, probeMin = 0.4,
      probeMax = 0.4, quietBest = -1).startsWith("partial run (12 queries"))
    assert(Bench.verdictLine(fullBoard = true, nQueries = 219,
      cfgDefault = false, flat = true, shift = 1.0, probeMin = 0.4,
      probeMax = 0.4, quietBest = -1).startsWith("non-default execution config"))
  }

  test("quietBestTotal: same commit, flat, small shift only") {
    val ss = Seq(
      Bench.Sample("aaa", 141.0, 1.499, flat = false, 0.44, 0.76),
      Bench.Sample("aaa", 94.3, 1.02, flat = true, 0.27, 0.31),
      Bench.Sample("aaa", 104.8, 1.1, flat = true, 0.3, 0.35),
      Bench.Sample("bbb", 80.0, 1.0, flat = true, 0.3, 0.3), // other commit
      Bench.Sample("aaa", 90.0, 1.45, flat = true, 0.3, 0.3)) // shifted
    assert(Bench.quietBestTotal(ss, "aaa") == 94.3)
    assert(Bench.quietBestTotal(ss, "ccc") == -1.0)
  }

  test("samples round-trip through BENCH.out.json") {
    val ss = Seq(
      Bench.Sample("abc1234", 94.301, 1.0214, flat = true, 0.2714, 0.3101),
      Bench.Sample("abc1234", 141.02, 1.499, flat = false, 0.4418, 0.7612))
    val json = s"""{"metric":"total","value":1.0${
      ss.map(Bench.sampleJson).mkString(",\"samples\":[", ",", "]")}}"""
    val f = java.nio.file.Files.createTempFile("bench-samples", ".json")
    try {
      java.nio.file.Files.write(f, json.getBytes("UTF-8"))
      val back = Bench.readPrevSamples(f)
      assert(back.map(_.commit) == Seq("abc1234", "abc1234"))
      assert(back.map(_.flat) == Seq(true, false))
      assert(math.abs(back.head.total - 94.301) < 1e-9)
      assert(math.abs(back(1).probeMax - 0.7612) < 1e-9)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("readPrevSamples: missing file / missing field / garbage all yield empty") {
    assert(Bench.readPrevSamples(
      java.nio.file.Paths.get("/tmp/does-not-exist-bench.json")).isEmpty)
    val f = java.nio.file.Files.createTempFile("bench-garbage", ".json")
    try {
      java.nio.file.Files.write(f, "not json".getBytes("UTF-8"))
      assert(Bench.readPrevSamples(f).isEmpty)
      java.nio.file.Files.write(f, """{"samples":"nope"}""".getBytes("UTF-8"))
      assert(Bench.readPrevSamples(f).isEmpty)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("seriesFlat: both-ends spread under 1.3x, non-positive values never flat") {
    assert(Bench.seriesFlat(Seq(0.40, 0.45, 0.50)))
    assert(!Bench.seriesFlat(Seq(0.44, 0.76, 0.58))) // r18's live host event
    assert(!Bench.seriesFlat(Nil))
    assert(!Bench.seriesFlat(Seq(0.0, 0.0)))
  }

  test("rollEligibleConfig: default env eligible; every shaping knob freezes rolls") {
    assert(Bench.rollEligibleConfig(Map.empty))
    assert(Bench.rollEligibleConfig(Map("SPARK_GRAFT_CPUS" -> "32",
      "SPARK_GRAFT_ROCKSDB_CHANGELOG" -> "1")))
    assert(!Bench.rollEligibleConfig(Map(
      "SPARK_GRAFT_MASTER" -> "local-cluster[2,8,8192]")))
    assert(!Bench.rollEligibleConfig(Map("SPARK_GRAFT_CPUS" -> "8")))
    assert(!Bench.rollEligibleConfig(Map(
      "SPARK_GRAFT_STREAM_FILES" -> "span:648000")))
    assert(!Bench.rollEligibleConfig(Map(
      "SPARK_GRAFT_STATE_PROVIDER" -> "rocksdb")))
    assert(!Bench.rollEligibleConfig(Map(
      "SPARK_GRAFT_ROCKSDB_CHANGELOG" -> "snapshot")))
  }

  test("ScanTimeListener: no observed tasks yields None, not a class flip") {
    val lis = new Bench.ScanTimeListener
    assert(lis.scanFraction("q_never_ran").isEmpty)
  }
}
