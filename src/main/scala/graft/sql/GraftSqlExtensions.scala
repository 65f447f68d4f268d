package graft.sql

import graft.exprs.{HashExprs, TextExprs}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the graft native expressions.
  *
  * The reference is config-driven (morphline `.conf`), but its users also
  * query the resulting tables with SQL; a Spark-native engine should expose
  * every custom signature/similarity primitive to `spark.sql(...)` so a
  * pure-SQL pipeline (or a BI tool / thriftserver session) can run the same
  * dedup math as the Scala API — SURVEY.md §2.F extension surface.
  *
  * Two installation paths, same function table:
  *  - `SparkSession.builder().withExtensions(new GraftSqlExtensions)` at
  *    session build time (cluster-wide via
  *    `spark.sql.extensions=graft.sql.GraftSqlExtensions`);
  *  - `GraftSqlExtensions.install(spark)` on a live session.
  *
  * One optimizer rule rides along — [[graft.plans.MaterializeGeneratorInput]]
  * (hoists lambda-invariant heavy subtrees out of generators; 17× on the
  * measured naive-explode shape, PLANS.md round 8) — injected at the
  * PRE-CBO seam, which runs AFTER the operator-optimization batch:
  * `injectOptimizerRule` would place it INSIDE that fixed-point batch,
  * where `CollapseProject` inlines single-use aliases back into lambda
  * bodies and silently undoes the hoist. NO custom SparkStrategy or plan
  * node rides along: every graft operator lowers to Catalyst expressions
  * + standard logical operators (SURVEY.md §7.3 — custom plan nodes are a
  * last resort and nothing here needs one).
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftSqlExtensions.functions.foreach(ext.injectFunction)
    ext.injectPreCBORule(_ => graft.plans.MaterializeGeneratorInput)
  }
}

object GraftSqlExtensions {

  // user-input problems surface as analysis errors (a plain invalid-input
  // message), NOT UnresolvedException — Spark frames the latter as an
  // internal error, which misreads bad arguments as engine bugs
  private def badArg(msg: String): Nothing =
    org.apache.spark.sql.classic.GraftBridge.analysisError(msg)

  private def intArg(fn: String, pos: Int, e: Expression): Int = e match {
    case Literal(v, IntegerType) => v.asInstanceOf[Int]
    case other =>
      badArg(s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def longArg(fn: String, pos: Int, e: Expression): Long = e match {
    case Literal(v, t) if t == IntegerType => v.asInstanceOf[Int].toLong
    case Literal(v, org.apache.spark.sql.types.LongType) => v.asInstanceOf[Long]
    case other =>
      badArg(s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int*): Unit =
    if (!n.contains(args.length)) badArg(
      s"$fn expects ${n.mkString(" or ")} arguments, got ${args.length}")

  private def desc(name: String, usage: String, builder: Seq[Expression] => Expression,
                   className: String = "graft.exprs.HashExprs",
                   group: String = "hash_funcs")
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(className, "", name, usage, "", "", "",
        group, "4.0.0", "", "built-in"),
      builder)

  /** The full SQL function table — one entry per native expression. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    desc("graft_word_shingles",
      "graft_word_shingles(text, n) - distinct word n-gram shingles", { args =>
        arity("graft_word_shingles", args, 2)
        HashExprs.WordShingles(args.head, intArg("graft_word_shingles", 1, args(1)))
      }),
    desc("graft_char_shingles",
      "graft_char_shingles(text, n) - distinct char n-gram shingles", { args =>
        arity("graft_char_shingles", args, 2)
        HashExprs.CharShingles(args.head, intArg("graft_char_shingles", 1, args(1)))
      }),
    desc("graft_minhash",
      "graft_minhash(shingles, k) - k-permutation minhash signature", { args =>
        arity("graft_minhash", args, 2)
        HashExprs.MinHashSig(args.head, intArg("graft_minhash", 1, args(1)))
      }),
    desc("graft_simhash",
      "graft_simhash(shingles) - 64-bit simhash signature", { args =>
        arity("graft_simhash", args, 1)
        HashExprs.SimHash64(args.head)
      }),
    desc("graft_hyperplane_lsh",
      "graft_hyperplane_lsh(vec, nBits[, seed]) - sign-random-projection bucket", { args =>
        arity("graft_hyperplane_lsh", args, 2, 3)
        val seed = if (args.length == 3) longArg("graft_hyperplane_lsh", 2, args(2)) else 42L
        HashExprs.HyperplaneLsh(args.head, intArg("graft_hyperplane_lsh", 1, args(1)), seed)
      }),
    desc("graft_vec_dot",
      "graft_vec_dot(a, b) - dot product of two double arrays", { args =>
        arity("graft_vec_dot", args, 2)
        HashExprs.VecDot(args.head, args(1))
      }),
    desc("graft_array_jaccard",
      "graft_array_jaccard(a, b) - exact Jaccard of two string arrays", { args =>
        arity("graft_array_jaccard", args, 2)
        HashExprs.ArrayJaccard(args.head, args(1))
      }),
    desc("graft_gunzip",
      "graft_gunzip(bin) - gzip-decompress a binary column", { args =>
        arity("graft_gunzip", args, 1)
        HashExprs.Gunzip(args.head)
      }),
    desc("graft_winnow_fps",
      "graft_winnow_fps(text, k, w) - sorted distinct winnowing fingerprints (window-min base-31 k-gram hashes)", { args =>
        arity("graft_winnow_fps", args, 3)
        val k = intArg("graft_winnow_fps", 1, args(1))
        val w = intArg("graft_winnow_fps", 2, args(2))
        if (k < 1 || k > 9) badArg("graft_winnow_fps: k must be in [1, 9] (base-31 hash exactness)")
        if (w < 1) badArg("graft_winnow_fps: w must be >= 1")
        HashExprs.WinnowFps(args.head, k, w)
      }),
    desc("graft_nfc",
      "graft_nfc(text) - Unicode NFC canonical composition", { args =>
        arity("graft_nfc", args, 1)
        TextExprs.NfcNormalize(args.head)
      }, className = "graft.exprs.TextExprs", group = "string_funcs"),
    desc("graft_confluent_frame",
      "graft_confluent_frame(payload, schemaId) - registry wire format: 0x00 + BE id + payload", { args =>
        arity("graft_confluent_frame", args, 2)
        // Built from catalyst nodes directly: a Column-composition
        // bridged back into the registry arrives as an unevaluable
        // ColumnNodeExpression (never analyzed inside a builder).
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.{BinaryType, IntegerType}
        val payload = args.head
        val beId = Unhex(StringLPad(Hex(Cast(args(1), IntegerType)),
          Literal(8), Literal("0")))
        If(IsNull(payload), Literal(null, BinaryType),
          Concat(Seq(Literal(Array[Byte](0), BinaryType), beId, payload)))
      }, className = "graft.exprs.AvroExprs"),
    desc("graft_confluent_unframe",
      "graft_confluent_unframe(framed) - (schema_id, payload) from registry wire format; null on bad frame", { args =>
        arity("graft_confluent_unframe", args, 1)
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types._
        val framed = args.head
        val sid = Cast(Conv(Hex(Substring(framed, Literal(2), Literal(4))),
          Literal(16), Literal(10)), IntegerType)
        val pay = Substring(framed, Literal(6), Literal(Int.MaxValue))
        val out = CreateNamedStruct(Seq(Literal("schema_id"), sid,
          Literal("payload"), pay))
        val bad = Or(Or(IsNull(framed), LessThan(Length(framed), Literal(5))),
          Not(EqualTo(Substring(framed, Literal(1), Literal(1)),
            Literal(Array[Byte](0), BinaryType))))
        If(bad, Literal(null, StructType(Seq(
            StructField("schema_id", IntegerType),
            StructField("payload", BinaryType)))), out)
      }, className = "graft.exprs.AvroExprs"),
    desc("graft_nearest_centroid",
      "graft_nearest_centroid(vec, array(array(..), ..)) - index of nearest centroid (squared L2, ties low)", { args =>
        arity("graft_nearest_centroid", args, 2)
        // Validate the literal's TYPE before reading elements: a user
        // writing array(array(1, 0), ...) folds to int/float ArrayData,
        // and an unchecked getDouble would surface as an internal
        // ClassCastException instead of this function's badArg path.
        // Any numeric element type is accepted and widened to double.
        import org.apache.spark.sql.types.{ArrayType => AT, _}
        val cents = args(1) match {
          case e if e.foldable => e.dataType match {
            case AT(AT(et: NumericType, _), _) =>
              def toD(row: org.apache.spark.sql.catalyst.util.ArrayData,
                      j: Int): Double = et match {
                case DoubleType => row.getDouble(j)
                case FloatType => row.getFloat(j).toDouble
                case LongType => row.getLong(j).toDouble
                case IntegerType => row.getInt(j).toDouble
                case ShortType => row.getShort(j).toDouble
                case ByteType => row.getByte(j).toDouble
                case d: DecimalType =>
                  row.getDecimal(j, d.precision, d.scale).toDouble
                case other => badArg(
                  s"graft_nearest_centroid: centroid element type ${other.sql} is not numeric")
              }
              e.eval() match {
                case ad: org.apache.spark.sql.catalyst.util.ArrayData =>
                  (0 until ad.numElements()).map { i =>
                    if (ad.isNullAt(i)) badArg(
                      s"graft_nearest_centroid: centroid $i is NULL")
                    val row = ad.getArray(i)
                    (0 until row.numElements()).map { j =>
                      if (row.isNullAt(j)) badArg(
                        s"graft_nearest_centroid: centroid $i element $j is NULL")
                      toD(row, j)
                    }.toSeq
                  }.toSeq
                case other => badArg(
                  s"graft_nearest_centroid: argument 2 evaluated to $other, expected array<array<double>>")
              }
            case other => badArg(
              s"graft_nearest_centroid: argument 2 must have type array<array<double>> (any numeric element), got ${other.sql}")
          }
          case other => badArg(
            s"graft_nearest_centroid: argument 2 must be a foldable array<array<double>> literal, got $other")
        }
        HashExprs.NearestCentroid(args.head, cents)
      }),
    desc("graft_wordpiece_count",
      "graft_wordpiece_count(tok, piece, ...) - greedy longest-match-first piece count (WordPiece runtime); pieces are string literals", { args =>
        if (args.isEmpty)
          badArg("graft_wordpiece_count expects at least 1 argument, got 0")
        val pieces = args.tail.zipWithIndex.map {
          case (Literal(v, org.apache.spark.sql.types.StringType), _) if v != null =>
            v.toString
          case (other, i) => badArg(
            s"graft_wordpiece_count: piece argument ${i + 2} must be a string literal, got $other")
        }
        TextExprs.WordpieceCount(args.head, pieces)
      }, className = "graft.exprs.TextExprs", group = "string_funcs"))

  /** Post-hoc registration into a live session (idempotent — re-register
    * replaces the same table).
    */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.classic.GraftBridge
        .registerFunction(spark, name, info, builder)
    }

  /** Post-hoc optimizer-rule registration for a live session (the
    * build-time path is the pre-CBO injection in [[GraftSqlExtensions]];
    * `extraOptimizations` run in the "User Provided Optimizers" batch —
    * both are safely after `CollapseProject`). Idempotent.
    */
  def installOptimizations(spark: SparkSession): Unit = {
    val rule = graft.plans.MaterializeGeneratorInput
    if (!spark.experimental.extraOptimizations.contains(rule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    }
  }
}
