package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's self-defense rule: a contended run never
  * overwrites clean evidence. */
class BenchSpec extends AnyFunSuite {

  test("clean run always writes the primary artifact") {
    assert(Bench.artifactDestination("b.json", 0.9, None) == "b.json")
    assert(Bench.artifactDestination("b.json", 0.9, Some(0.5)) == "b.json")
    assert(Bench.artifactDestination("b.json", 0.9, Some(6.5)) == "b.json")
  }

  test("contended run is demoted only when the existing artifact is clean") {
    assert(Bench.artifactDestination("b.json", 6.5, Some(0.99)) == "b.json.contended")
    // no prior artifact, or a prior contended one: some numbers beat none
    assert(Bench.artifactDestination("b.json", 6.5, None) == "b.json")
    assert(Bench.artifactDestination("b.json", 6.5, Some(5.4)) == "b.json")
    // boundary: load exactly at the threshold counts as clean
    assert(Bench.artifactDestination("b.json", Bench.ContendedLoad, Some(0.5)) == "b.json")
  }

  test("existingLoadAvg parses the stamped field and tolerates garbage") {
    val dir = java.nio.file.Files.createTempDirectory("benchspec")
    val p = dir.resolve("a.json")
    java.nio.file.Files.write(p,
      """{"metric":"total","load_avg_start":0.987,"value":1.0}""".getBytes("UTF-8"))
    assert(Bench.existingLoadAvg(p.toString).contains(0.987))
    assert(Bench.existingLoadAvg(dir.resolve("missing.json").toString).isEmpty)
    val q = dir.resolve("b.json")
    java.nio.file.Files.write(q, "not json at all".getBytes("UTF-8"))
    assert(Bench.existingLoadAvg(q.toString).isEmpty)
  }
}
