package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift gate for COVERAGE.md's generated query index (r18 VERDICT item
  * 8): the committed section must equal what `graft.tools.CoverageIndex`
  * renders from the live `SparkEntry.queries` registry — an added,
  * removed, or relocated query without a doc regeneration fails here.
  * (Same pattern as RegistryCoverageSpec for the morphline command list.)
  */
class CoverageIndexSpec extends AnyFunSuite {

  test("COVERAGE.md generated query index matches the live registry") {
    val path = java.nio.file.Paths.get("COVERAGE.md")
    assert(java.nio.file.Files.exists(path), "COVERAGE.md missing")
    val doc = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val b = graft.tools.CoverageIndex.beginMarker
    val e = graft.tools.CoverageIndex.endMarker
    assert(doc.contains(b) && doc.contains(e),
      "COVERAGE.md lacks the generated query index — run " +
        "`sbt \"runMain graft.tools.CoverageIndex\"`")
    val committed = doc.substring(doc.indexOf(b),
      doc.indexOf(e) + e.length)
    val rendered = graft.tools.CoverageIndex.render()
    assert(committed == rendered,
      "COVERAGE.md query index drifted from SparkEntry.queries — " +
        "regenerate with `sbt \"runMain graft.tools.CoverageIndex\"`")
  }

  test("every query key has a discoverable registration site") {
    val sites = graft.tools.CoverageIndex.registrationSites()
    val missing = graft.SparkEntry.queries.keys.filterNot(sites.contains)
    assert(missing.isEmpty, s"no registration site found for: ${missing.mkString(", ")}")
  }
}
