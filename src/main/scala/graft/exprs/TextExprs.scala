package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization expressions for corpus cleaning.
  *
  * Training-data pipelines canonicalize text before hashing/dedup so that
  * visually-identical strings (e.g. "é" composed vs "e"+U+0301 decomposed)
  * produce identical fingerprints — otherwise every dedup tier silently
  * under-merges. The reference has no Unicode layer (its `toString` command
  * only trims — StandardOps covers that); this is part of the §2.G
  * training-data surface.
  *
  * Spark has no built-in NFC function, and the `transform`/regexp toolbox
  * can't express canonical composition, so this is the (b)-tier custom
  * Expression from SURVEY.md §7.3. `java.text.Normalizer` implements the
  * Unicode-standard algorithm (UAX #15), the same spec DuckDB's
  * `nfc_normalize` (utf8proc) implements — which is what makes the op
  * oracle-checkable across engines.
  */
object TextExprs {

  /** NFC-normalize a string (Unicode canonical composition). Nulls pass
    * through (UnaryExpression default); already-NFC ASCII is returned
    * as-is without re-encoding (the fast path for most corpus text).
    */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) {
        input
      } else {
        UTF8String.fromString(
          java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      }
    }
    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
  }

  import org.apache.spark.sql.classic.GraftBridge

  def nfc_normalize(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))

  /** Greedy longest-match-first segmentation count (the WordPiece/BERT
    * runtime algorithm, Wu et al. 2016 §4.1): at each position consume
    * the longest vocabulary piece that prefixes the remainder, else one
    * character (every corpus character is trivially a piece of its own
    * word, so the fallback never fails). Returns the piece count.
    *
    * The learned multi-char pieces ride as a constructor parameter (the
    * [[graft.exprs.HashExprs.HyperplaneLsh]] pattern): they are the
    * trained artifact — a driver-held constant of `steps` strings — not
    * data, so the whole segmentation runs as one scan-stage expression
    * with a per-length hash-set lookup, no join against a vocab table.
    */
  case class WordpieceCount(child: Expression, pieces: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.IntegerType
    @transient private lazy val byLen: Map[Int, Set[String]] =
      pieces.filter(_.length >= 2).groupBy(_.length)
        .map { case (k, v) => k -> v.toSet }
    @transient private lazy val maxLen: Int =
      if (byLen.isEmpty) 1 else byLen.keys.max
    /** The segmentation loop, shared by interpreted eval and codegen
      * (the generated code calls it through a reference object — the
      * per-length hash sets stay JVM objects, the surrounding row
      * pipeline stays inside whole-stage codegen instead of falling
      * back to interpreted expression trees per token occurrence).
      */
    def countPieces(u: UTF8String): Int = {
      val s = u.toString
      var pos = 0
      var n = 0
      while (pos < s.length) {
        var step = 1
        var l = math.min(maxLen, s.length - pos)
        while (l >= 2 && step == 1) {
          if (byLen.get(l).exists(_.contains(s.substring(pos, pos + l))))
            step = l
          l -= 1
        }
        pos += step
        n += 1
      }
      n
    }
    override def nullSafeEval(input: Any): Any =
      java.lang.Integer.valueOf(countPieces(input.asInstanceOf[UTF8String]))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("wpCount", this, classOf[WordpieceCount].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countPieces($c);")
    }
    override protected def withNewChildInternal(c: Expression): WordpieceCount =
      copy(child = c)
  }

  def wordpiece_count(tok: Column, pieces: Seq[String]): Column =
    GraftBridge.column(WordpieceCount(GraftBridge.expression(tok), pieces))
}
