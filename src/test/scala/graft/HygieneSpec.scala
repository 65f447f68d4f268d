package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Source hygiene: no raw control bytes in any tracked source file.
  *
  * A raw NUL inside a char/string literal compiles fine but makes git treat
  * the file as binary (killing diffs, review tooling, and text-based
  * similarity scanners) and has twice produced subtle runtime hash
  * mismatches (e.g. `concat_ws` on a NUL where `" "` was intended). Escapes
  * like `\u0000` in source text are fine — only literal bytes are banned.
  */
class HygieneSpec extends AnyFunSuite {

  private def sources(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter { p =>
        val n = p.toString
        n.endsWith(".scala") || n.endsWith(".sbt") || n.endsWith(".md") ||
          n.endsWith(".py") || n.endsWith(".conf") || n.endsWith(".json")
      }
      .toSeq

  test("no raw control bytes in source files") {
    val roots = Seq(Paths.get("src"), Paths.get("tools"), Paths.get("build.sbt"))
      .filter(Files.exists(_))
    val offenders = roots.flatMap(sources).flatMap { p =>
      val b = Files.readAllBytes(p)
      val bad = b.zipWithIndex.collect {
        // allow \t(9) \n(10) \v(11) \f(12) \r(13); ban NUL..BS and SO..US
        case (x, i) if (x >= 0 && x < 9) || (x >= 14 && x < 32) => i
      }
      if (bad.isEmpty) None else Some(s"$p: control bytes at offsets ${bad.take(5).mkString(",")}")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
