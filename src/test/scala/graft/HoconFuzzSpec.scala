package graft

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import graft.pipeline.Hocon
import org.scalacheck.Gen

import scala.jdk.CollectionConverters._

/** Fuzzing for the hand-written HOCON reader (Hocon.scala) — the layer
  * every reference-parity config passes through. Two properties:
  *
  *  1. ROUND-TRIP: a random document AST rendered to HOCON text with
  *     randomized surface syntax (quoted/unquoted keys, `:` / `=` /
  *     direct-block separators, comma vs newline item separation,
  *     injected `#` and `//` comments, substitutions) parses and
  *     resolves back to exactly the expected Jackson tree.
  *  2. TOTALITY: adversarial garbage over the grammar's alphabet either
  *     parses or throws a CLEAN IllegalArgumentException — never hangs,
  *     never dies with StringIndexOutOfBounds/NumberFormat internals.
  *
  * This fuzz found three reader bugs on its first runs (each now fixed
  * and pinned below): `[}` looped forever appending empty text nodes
  * (no-progress list element), a truncated `\u` escape threw
  * StringIndexOutOfBounds, and >19-digit integer literals threw
  * NumberFormatException out of `toLong`.
  */
class HoconFuzzSpec extends SparkSpec {

  private val F = JsonNodeFactory.instance
  private val baseSeed: Long =
    sys.props.get("graft.prop.seed").map(_.toLong).getOrElse(42L)
  private def forAllSampled[T](gen: Gen[T], n: Int)(body: T => Unit): Unit = {
    var ran = 0
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(baseSeed + i * 1000L)).foreach { t =>
        ran += 1; body(t)
      }
    }
    assert(ran >= n / 2, s"only $ran/$n samples generated — fuzz is vacuous")
  }

  // ---- document AST ----------------------------------------------------
  private sealed trait H
  private case class HStr(s: String, quoted: Boolean) extends H
  private case class HLong(n: Long) extends H
  private case class HBool(b: Boolean) extends H
  private case object HNull extends H
  private case class HList(items: List[H]) extends H
  private case class HObj(fields: List[(String, H, Int)]) extends H
  // field sep style: 0 = ':', 1 = '=', 2 = direct block (objects only)

  // unquoted tokens must dodge the bool/null/number lexemes and the
  // terminator charset; identifier-shaped strings do
  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private def genH(depth: Int): Gen[H] = {
    val leaf = Gen.frequency(
      3 -> ident.map(HStr(_, quoted = false)),
      3 -> (for { s <- Gen.listOfN(6, Gen.choose(' ', '~')) }
        yield HStr(s.mkString, quoted = true)),
      2 -> Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2).map(HLong),
      1 -> Gen.oneOf(true, false).map(HBool),
      1 -> Gen.const(HNull))
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> Gen.chooseNum(0, 3).flatMap(n =>
        Gen.listOfN(n, genH(depth - 1)).map(HList(_))),
      2 -> genObj(depth - 1))
  }

  private def genObj(depth: Int): Gen[HObj] = for {
    n <- Gen.chooseNum(1, 4)
    fields <- Gen.sequence((0 until n).map(i => for {
      v <- genH(depth)
      sep <- v match {
        case _: HObj => Gen.chooseNum(0, 2)
        case _ => Gen.chooseNum(0, 1)
      }
    } yield (s"k$i", v, sep)).toList)
  } yield HObj(fields.asScala.toList)

  // ---- rendering with randomized surface syntax ------------------------
  private def renderStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    } + "\""

  /** style bits per node come from a deterministic counter so one sample
    * exercises several syntax combinations at once */
  private def render(h: H, indent: Int, style: Iterator[Int]): String = {
    val pad = "  " * indent
    h match {
      case HStr(s, false) => s
      case HStr(s, true) => renderStr(s)
      case HLong(n) => n.toString
      case HBool(b) => b.toString
      case HNull => "null"
      case HList(items) =>
        if (items.isEmpty) "[]"
        else {
          val sepNl = style.next() % 2 == 0
          val body = items.map(render(_, indent + 1, style))
          if (sepNl)
            "[\n" + body.map(pad + "  " + _).mkString("\n") + "\n" + pad + "]"
          else "[" + body.mkString(", ") + "]"
        }
      case HObj(fields) =>
        val body = fields.map { case (k, v, sep) =>
          val key = if (style.next() % 2 == 0) k else "\"" + k + "\""
          val rendered = render(v, indent + 1, style)
          sep match {
            case 0 => s"$key : $rendered"
            case 1 => s"$key = $rendered"
            case _ => s"$key $rendered" // direct block (objects only)
          }
        }
        val comment =
          if (style.next() % 3 == 0) "  # trailing comment\n" + "  " * (indent + 1)
          else if (style.next() % 3 == 1) "  // c-style\n" + "  " * (indent + 1)
          else "\n" + "  " * (indent + 1)
        "{\n" + "  " * (indent + 1) +
          body.mkString(comment) + "\n" + pad + "}"
    }
  }

  private def expected(h: H): JsonNode = h match {
    case HStr(s, _) => F.textNode(s)
    case HLong(n) => F.numberNode(n)
    case HBool(b) => F.booleanNode(b)
    case HNull => F.nullNode()
    case HList(items) =>
      val a = F.arrayNode(); items.foreach(i => a.add(expected(i))); a
    case HObj(fields) =>
      val o = F.objectNode()
      fields.foreach { case (k, v, _) => o.set[JsonNode](k, expected(v)) }
      o
  }

  test("round-trip: random documents under randomized surface syntax " +
      "parse and resolve to the expected tree") {
    forAllSampled(genObj(3), n = 25) { doc =>
      val style = Iterator.from(doc.hashCode.abs)
      val text = render(doc, 0, style.map(_ + 1))
      val got =
        try Hocon.resolve(Hocon.parse(text))
        catch { case e: Exception =>
          fail(s"parse/resolve failed for:\n$text\n${e.getMessage}") }
      assert(got == expected(doc),
        s"tree diverged for:\n$text\n got      $got\n expected ${expected(doc)}")
    }
  }

  test("substitutions: required resolve from doc or env, optional-missing " +
      "drops the field — under random documents") {
    forAllSampled(genObj(2), n = 15) { doc =>
      // pure doc + three substitution fields referencing (a) a doc key,
      // (b) an env-provided key, (c) a missing optional
      val firstKey = doc.fields.head._1
      val text = render(doc, 0, Iterator.from(1)) stripSuffix "}"
      val full = text +
        s"\n  sDoc : $${$firstKey}\n  sEnv = $${ENV_ONLY}\n" +
        "  sOpt : ${?NOWHERE_AT_ALL}\n}"
      val got = Hocon.resolve(Hocon.parse(full),
        env = Map("ENV_ONLY" -> "from-env").get)
      assert(got.get("sDoc") == expected(doc.fields.head._2),
        s"doc-path substitution diverged for:\n$full")
      assert(got.get("sEnv") == F.textNode("from-env"))
      assert(!got.has("sOpt"), "optional-missing must drop the field")
    }
  }

  test("totality: garbage inputs parse or throw clean " +
      "IllegalArgumentException within a time bound — never hang") {
    val alphabet = "{}[]\":=$,#\\ \nabc1?.${".toList
    val garbage = for {
      n <- Gen.chooseNum(0, 120)
      cs <- Gen.listOfN(n, Gen.oneOf(alphabet))
    } yield cs.mkString
    // pin the three first-run findings as regression inputs
    val pinned = Seq("[}", "[}]", "\"\\u12", "\"\\uzzzz\"",
      "a : 99999999999999999999999999", "[{]", "{a:}", "[,]", "${", "${}")
    forAllSampled(Gen.listOfN(12, garbage), n = 20) { batch =>
      (pinned ++ batch).foreach { s =>
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val outcome = Future(
          try { Hocon.parse(s); "ok" }
          catch { case _: IllegalArgumentException => "clean" })
        // a hang or an unclean exception class both fail here
        val r = Await.result(outcome, 10.seconds)
        assert(r == "ok" || r == "clean", s"unclean outcome for: $s")
      }
    }
  }
}
