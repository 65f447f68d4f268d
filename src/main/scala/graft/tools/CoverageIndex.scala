package graft.tools

/** Generates COVERAGE.md's query→file index from the live driver
  * contract (r18 VERDICT item 8): the table is derived from
  * `SparkEntry.queries` / `SparkEntry.oracleSql` at build time, so the
  * driver's gate list and the doc cannot drift — CoverageIndexSpec
  * re-renders the table and fails `sbt test` when the committed section
  * differs.
  *
  * Usage: sbt "runMain graft.tools.CoverageIndex"   (rewrites COVERAGE.md
  * in place between the BEGIN/END markers, appending the section if
  * absent).
  */
object CoverageIndex {

  val beginMarker = "<!-- BEGIN GENERATED QUERY INDEX -->"
  val endMarker = "<!-- END GENERATED QUERY INDEX -->"

  private val queryDirs = Seq("src/main/scala/graft/queries")

  /** First registration site (`"name" ->`) of each query key across the
    * query-registry sources. Matching is anchored to each file's
    * `val queries: Map[...] = Map(` declaration window — lines before it
    * (imports, helpers, scaladoc mentioning another file's key) and
    * lines from the oracle-SQL map onward are ignored, so a key literal
    * appearing early in a lexically earlier file can no longer steal the
    * anchor (ADVICE r19). */
  def registrationSites(): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val sites = scala.collection.mutable.Map.empty[String, String]
    val regStart = "val queries\\s*:\\s*Map\\[".r
    val regEnd = "val oracle\\w*\\s*:\\s*Map\\[".r
    for (d <- queryDirs) {
      val dir = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.isDirectory(dir)) {
        // Files.list must be closed (ADVICE r19: the stream held a
        // directory handle per call — CoverageIndexSpec re-renders on
        // every sbt test run)
        val ls = java.nio.file.Files.list(dir)
        val files =
          try ls.iterator().asScala
            .filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
          finally ls.close()
        for (f <- files) {
          val lines = java.nio.file.Files.readAllLines(f).asScala
          var inRegistry = false
          lines.zipWithIndex.foreach { case (line, i) =>
            if (regStart.findFirstIn(line).isDefined) inRegistry = true
            else if (regEnd.findFirstIn(line).isDefined) inRegistry = false
            if (inRegistry) {
              val m = "\"([a-z0-9_]+)\"\\s*->".r.findFirstMatchIn(line)
              m.foreach { mm =>
                val k = mm.group(1)
                if (!sites.contains(k))
                  sites(k) = s"${f.toString.stripPrefix("src/main/scala/")}:${i + 1}"
              }
            }
          }
        }
      }
    }
    sites.toMap
  }

  /** Render the generated section (markers included). */
  def render(): String = {
    val sites = registrationSites()
    val keys = graft.SparkEntry.queries.keys.toSeq.sorted
    val oracle = graft.SparkEntry.oracleSql.keySet
    val rows = keys.map { k =>
      val o = if (oracle(k)) "oracle" else "rows-only"
      val h = if (graft.Bench.headline(k)) "headline" else ""
      s"| `$k` | $o | `${sites.getOrElse(k, "?")}` | $h |"
    }
    val counts =
      s"${keys.size} queries (${keys.count(oracle)} oracle-gated, " +
        s"${keys.size - keys.count(oracle)} rows-only; " +
        s"${keys.count(graft.Bench.headline)} on the bench headline)."
    (Seq(
      beginMarker,
      "",
      s"Generated from `SparkEntry.queries` by `graft.tools.CoverageIndex`",
      s"(`sbt \"runMain graft.tools.CoverageIndex\"`); CoverageIndexSpec fails",
      s"`sbt test` if this section drifts from the registry. $counts",
      "",
      "| query | correctness | registered at | bench |",
      "|---|---|---|---|") ++ rows ++ Seq("", endMarker)).mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get("COVERAGE.md")
    require(java.nio.file.Files.exists(path),
      "COVERAGE.md not found — run from the repo root")
    val doc = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val section = render()
    val out =
      if (doc.contains(beginMarker) && doc.contains(endMarker)) {
        val pre = doc.substring(0, doc.indexOf(beginMarker))
        val post = doc.substring(
          doc.indexOf(endMarker) + endMarker.length)
        pre + section + post
      } else
        doc.stripTrailing() +
          "\n\n## Query index (generated)\n\n" + section + "\n"
    java.nio.file.Files.write(path, out.getBytes("UTF-8"))
    System.err.println(
      s"[coverage-index] wrote ${graft.SparkEntry.queries.size}-query index to $path")
  }
}
