package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Pins the BENCH_QUERIES.json clobber guard: round 7 overwrote the
  * committed full-registry per-query map with a 1-query sf10 subset run
  * TWICE (cdef9c6 repaired it, 86b9336 reintroduced it). The guard has
  * two independent layers, both pinned here:
  *   1. non-canonical runs (subset args, alternate SF) write to
  *      `BENCH_QUERIES_partial.json`, never the canonical file;
  *   2. even a run that CLAIMS full-registry sf0.1 cannot shrink an
  *      existing map with more queries than it carries.
  */
class BenchGuardSpec extends AnyFunSuite {

  private def tempDir() =
    Files.createTempDirectory(Paths.get("target"), "benchguard")

  private val full3 =
    """{"metric":"total","queries":{"qa":1.0,"qb":2.0,"qc":3.0}}"""
  private val sub1 =
    """{"metric":"total","queries":{"qa":1.0}}"""

  test("subset run writes the partial file, not the canonical map") {
    val dir = tempDir()
    val canonical = dir.resolve("BENCH_QUERIES.json")
    Files.writeString(canonical, full3)
    Bench.writeQueryMap(sub1, fullRegistry = false,
      sfDir = "/root/testdata/sf0.1", n = 1, baseDir = dir)
    assert(Files.readString(canonical) === full3,
      "subset run must not touch BENCH_QUERIES.json")
    assert(Files.exists(dir.resolve("BENCH_QUERIES_partial.json")))
  }

  test("alternate-SF full run writes the partial file") {
    val dir = tempDir()
    val canonical = dir.resolve("BENCH_QUERIES.json")
    Files.writeString(canonical, full3)
    Bench.writeQueryMap(sub1, fullRegistry = true,
      sfDir = "data/sf10", n = 1, baseDir = dir)
    assert(Files.readString(canonical) === full3,
      "sf10 run must not touch BENCH_QUERIES.json")
    assert(Files.exists(dir.resolve("BENCH_QUERIES_partial.json")))
  }

  test("a full sf0.1 run cannot SHRINK an existing larger map") {
    val dir = tempDir()
    val canonical = dir.resolve("BENCH_QUERIES.json")
    Files.writeString(canonical, full3)
    Bench.writeQueryMap(sub1, fullRegistry = true,
      sfDir = "/root/testdata/sf0.1", n = 1, baseDir = dir)
    assert(Files.readString(canonical) === full3,
      "a 1-query map must never replace a 3-query map")
    assert(Files.exists(dir.resolve("BENCH_QUERIES_partial.json")))
  }

  test("a full sf0.1 run with >= queries DOES refresh the canonical map") {
    val dir = tempDir()
    val canonical = dir.resolve("BENCH_QUERIES.json")
    Files.writeString(canonical, sub1)
    Bench.writeQueryMap(full3, fullRegistry = true,
      sfDir = "/root/testdata/sf0.1", n = 3, baseDir = dir)
    assert(Files.readString(canonical).startsWith(full3),
      "guard must not block legitimate full-registry refreshes")
  }

  test("first full sf0.1 run creates the canonical map when absent") {
    val dir = tempDir()
    Bench.writeQueryMap(full3, fullRegistry = true,
      sfDir = "/root/testdata/sf0.1", n = 3, baseDir = dir)
    assert(Files.readString(dir.resolve("BENCH_QUERIES.json")).startsWith(full3))
  }

  test("steady-state refresh with the SAME query count hits the canonical map") {
    // the round-8 regex counted the "queries": key itself, so existingN was
    // n+1 and every same-size refresh (the normal case) was diverted — the
    // warm min-of-2 map never reached the canonical artifact
    val dir = tempDir()
    val canonical = dir.resolve("BENCH_QUERIES.json")
    Files.writeString(canonical, full3)
    val refreshed =
      """{"metric":"total","queries":{"qa":0.5,"qb":1.5,"qc":2.5}}"""
    val wrote = Bench.writeQueryMap(refreshed, fullRegistry = true,
      sfDir = "/root/testdata/sf0.1", n = 3, baseDir = dir)
    assert(wrote === "BENCH_QUERIES.json",
      "same-count full refresh must report the canonical file")
    assert(Files.readString(canonical).startsWith(refreshed),
      "same-count full refresh must reach the canonical file")
  }

  test("writeQueryMap returns the file it actually wrote") {
    val dir = tempDir()
    val canonical = dir.resolve("BENCH_QUERIES.json")
    Files.writeString(canonical, full3)
    val wrote = Bench.writeQueryMap(sub1, fullRegistry = true,
      sfDir = "/root/testdata/sf0.1", n = 1, baseDir = dir)
    assert(wrote === "BENCH_QUERIES_partial.json",
      "a diverted write must report the partial file, not the canonical name")
  }
}
