package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass signature expressions for dedup at scale.
  *
  * Why custom Expressions (SURVEY.md §7.3 preference order (b)): the
  * column-function formulation of simhash needs 64 `aggregate` passes over
  * the shingle array per row (one per bit) and minhash needs `k` re-hashing
  * passes — both blow up expression-tree size, fall out of codegen, and go
  * quadratic per document. These expressions compute the whole signature in
  * ONE imperative pass per row: hash each shingle once, derive the k
  * permutations / 64 bit-votes incrementally. CodegenFallback is fine —
  * per-row loop cost dominates, and the surrounding plan stays codegen'd.
  *
  * Hashing matches Spark's `xxhash64` (XxHash64Function) so signatures are
  * stable across engines/runs.
  */
object HashExprs {

  /** Affine-permutation constants (odd multipliers — splitmix64 increments). */
  private[exprs] def mult(i: Int): Long = 0x9E3779B97F4A7C15L * (2L * i + 1L)
  private[exprs] def inc(i: Int): Long = 0xBF58476D1CE4E5B9L * (i + 1L)

  /** MinHash signature: array<string> shingles → array<long> of `k` min
    * hashes. One xxhash64 per shingle; permutations are affine transforms of
    * the base hash (the standard one-hash minwise trick).
    */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(k)(Long.MaxValue)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val base = XxHash64Function.hash(
            arr.getUTF8String(j), StringType, 42L)
          var i = 0
          while (i < k) {
            val h = base * mult(i) + inc(i)
            if (h < mins(i)) mins(i) = h
            i += 1
          }
        }
        j += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** SimHash-64: array<string> shingles → long signature. One pass:
    * per-shingle xxhash64, ±1 vote per bit, sign of the vote vector.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val h = XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        j += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) sig |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(sig)
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  /** Word n-gram shingles: string → array<string>, one tokenize pass.
    *
    * The column-function formulation (`transform(sequence(...), i =>
    * concat_ws(slice(toks, i, n)))`) re-evaluates the tokenizer expression
    * once per shingle index — O(len · shingles) per row. This expression
    * tokenizes once (lowercase, split on non-alphanumeric runs) and emits
    * the distinct shingles in first-occurrence order.
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString.toLowerCase
      val toks = new scala.collection.mutable.ArrayBuffer[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isLetterOrDigit(c)) sb.append(c)
        else if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
        i += 1
      }
      if (sb.length > 0) toks += sb.toString
      // Empty/whitespace-only text → empty array, not [""]: a non-empty
      // sentinel shingle would give all empty docs identical signatures and
      // pile them into one LSH hot bucket (and defeat size(sh)>0 guards).
      if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
      val count = math.max(toks.length - n, 0) + 1
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var j = 0
      while (j < count) {
        val end = math.min(j + n, toks.length)
        seen.add(UTF8String.fromString(toks.slice(j, end).mkString(" ")))
        j += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  }

  /** Random-hyperplane LSH bucket: array<double> vector → long bucket id of
    * `nBits` sign bits. The column-function formulation is an nBits×dim-term
    * expression tree (interpreted, huge); this evaluates the projections in
    * one loop with a lazily built ±1 hyperplane matrix (deterministic from
    * the seed — no stored model, reproducible across runs/engines).
    */
  case class HyperplaneLsh(child: Expression, nBits: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    @transient private var signs: Array[Array[Double]] = _
    private def signMatrix(dim: Int): Array[Array[Double]] = {
      if (signs == null || signs(0).length != dim) {
        signs = Array.tabulate(nBits, dim) { (b, d) =>
          // splitmix64-style scramble of (seed, bit, dim)
          var z = seed + b * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
        }
      }
      signs
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val dim = arr.numElements()
      val m = signMatrix(dim)
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        var proj = 0.0
        val row = m(b)
        var d = 0
        while (d < dim) { proj += arr.getDouble(d) * row(d); d += 1 }
        if (proj >= 0) bucket |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(bucket)
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneLsh = copy(child = c)
  }

  /** Character n-gram shingles over whitespace-normalized lowercase text —
    * same single-pass rationale as [[WordShingles]].
    */
  case class CharShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val raw = input.asInstanceOf[UTF8String].toString.toLowerCase
      val s = raw.replaceAll("\\s+", " ")
      val seen = new java.util.LinkedHashSet[UTF8String]()
      if (s.length >= n) {
        var i = 0
        while (i + n <= s.length) {
          seen.add(UTF8String.fromString(s.substring(i, i + n)))
          i += 1
        }
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): CharShingles = copy(child = c)
  }

  /** Nearest-centroid assignment: array<double> vector → index of the
    * closest centroid by squared L2, ties to the LOWEST index. The centroid
    * matrix rides as a constructor parameter (like [[HyperplaneLsh]]'s
    * hyperplanes), NOT as k literal-array children: the column-function
    * formulation (k `struct(zip_with·zip_with)` branches + `least`) puts
    * k·dim literal doubles and 2k interpreted higher-order lambdas into the
    * plan — at k = 32, dim = 64 the per-iteration ANALYSIS/canonicalization
    * of that tree cost ~1.3 s, dwarfing execution (measured round 8,
    * PLANS.md). One plan node + one fused loop removes both costs.
    *
    * Arithmetic is bit-identical to the zip_with formulation and the SQL
    * oracles: d² accumulates (v_j − c_j)² sequentially over j.
    * `Seq[Seq[Double]]` (not Array) so structural equality keeps canonical
    * plan matching — and therefore cache reuse — working across calls.
    */
  case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    require(centroids.nonEmpty, "NearestCentroid needs at least one centroid")
    require(centroids.map(_.length).distinct.size == 1,
      "NearestCentroid centroids must share one dimension")
    // array<float> (the raw embeddings column) arrives via an implicit
    // cast instead of being misread element-by-element at runtime.
    // (Covariant return: AbstractDataType is private[sql] in Spark 4, but
    // DataType is a public subtype, so the override never names it.)
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = IntegerType
    @transient private lazy val cs: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val dim = arr.numElements()
      // A dimension mismatch is ALWAYS a caller bug (stale codebook, a
      // malformed embedding row): truncating the distance loop would
      // return a plausible but wrong cell index and degrade ivfAssign /
      // semanticDedup / pqEncode silently.
      if (dim != cs(0).length)
        throw new IllegalArgumentException(
          s"NearestCentroid: input vector has $dim dims, centroids have ${cs(0).length}")
      var best = 0
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        var d = 0.0
        var j = 0
        while (j < dim) {
          val diff = arr.getDouble(j) - c(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = i } // strict <: lowest index wins ties
        i += 1
      }
      java.lang.Integer.valueOf(best)
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
  }

  /** Gzip-decompress a binary payload (compressed attachment bodies — the
    * decompress step ahead of the parsers). Null on corrupt input would
    * hide data problems, so malformed gzip throws; pre-filter with the
    * magic-byte sniff (Multimodal.mediaStats) when tolerance is wanted.
    */
  case class Gunzip(child: Expression, maxBytes: Long = Gunzip.DefaultMax)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true // fail-soft: null from non-null child
    // Parser null-contract: a corrupt/truncated stream yields NULL (the
    // record is filterable) — ZipException out of the scan would abort
    // the whole batch, where the reference's decompress fails only the
    // record. The same contract bounds DECOMPRESSED size: a zip bomb
    // (kilobytes expanding to gigabytes) would OOM the executor before
    // any catch could run, so inflation past `maxBytes` nulls the record
    // instead of allocating further — at 100 TB a hostile payload is a
    // certainty, and one bomb must cost one record, not an executor.
    override def nullSafeEval(input: Any): Any =
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(input.asInstanceOf[Array[Byte]]))
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          var total = 0L
          var bombed = false
          while (n >= 0 && !bombed) {
            total += n
            if (total > maxBytes) bombed = true
            else { out.write(buf, 0, n); n = in.read(buf) }
          }
          if (bombed) null else out.toByteArray
        } finally in.close()
      } catch { case _: java.io.IOException => null }
    override protected def withNewChildInternal(c: Expression): Gunzip = copy(child = c)
  }

  object Gunzip {
    /** Default decompressed-size cap: generous for any log/document
      * payload (the testdata's largest bodies are kilobytes; real
      * attachment payloads are megabytes), small enough that one
      * hostile record cannot take a multi-GB bite out of an executor
      * heap shared by ~8 concurrent tasks. */
    val DefaultMax: Long = 256L * 1024 * 1024
  }

  /** Dot product of two double arrays in one loop. Accumulation order is
    * sequential (index 0..n-1) — bit-identical to the
    * `aggregate(zip_with(...))` formulation and to engines summing lists
    * left-to-right, but without the per-row zipped-array allocation.
    */
  case class VecDot(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
      java.lang.Double.valueOf(acc)
    }
    // Full codegen (not CodegenFallback): the dot loop inlines into the
    // surrounding whole-stage-generated code — no per-row boxing/virtual
    // calls in the kNN hot path.
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
  }

  /** Exact Jaccard similarity of two string arrays in one hash-set pass —
    * |a ∩ b| / |a ∪ b| over the distinct elements. Replaces the
    * `array_intersect`/`array_union` pair (two generic set builds per
    * comparison) in the LSH verification hot path.
    */
  case class ArrayJaccard(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val setA = new java.util.HashSet[UTF8String](a.numElements() * 2)
      var i = 0
      while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
      val seenB = new java.util.HashSet[UTF8String](b.numElements() * 2)
      var inter = 0
      var j = 0
      while (j < b.numElements()) {
        val e = b.getUTF8String(j)
        if (seenB.add(e) && setA.contains(e)) inter += 1
        j += 1
      }
      val union = setA.size + seenB.size - inter
      java.lang.Double.valueOf(
        if (union == 0) 0.0 else inter.toDouble / union.toDouble)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayJaccard =
      copy(left = l, right = r)
  }

  /** Winnowing fingerprints (Schleimer SIGMOD 2003): string → sorted
    * distinct array<long> of window-minimum k-gram hashes. Exactly
    * equivalent to [[graft.text.TextAnalysis.winnowGramHashes]] piped into
    * `winnowSelect` — normalize (lowercase, strip non-[a-z0-9]), base-31
    * polynomial hash per k-gram, min per length-`w` window, distinct,
    * ascending — but in ONE imperative pass per row.
    *
    * Why native: the column formulation re-evaluates its subtrees per
    * lambda element — higher-order functions never enter codegen and get
    * no common-subexpression elimination, so after project collapse the
    * regexp-normalize runs once per k-gram and the whole O(m) hash array
    * once per window: O(m²) regex work per document (observed: a
    * 40-minute single task at sf0.01). This expression is O(m·k) with a
    * single normalize pass; w-window minima are a direct scan (w is
    * small). k ≤ 9 keeps the base-31 hash exact in a long (no overflow),
    * matching the SQL oracle's BIGINT arithmetic.
    */
  case class WinnowFps(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1 && k <= 9, "k-gram hash is exact only for k <= 9")
    require(w >= 1, "window must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    private val empty = new GenericArrayData(Array.emptyLongArray)
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return empty // column version yields [] on null text
      // same normalization as regexp_replace(lower(text), "[^a-z0-9]+", "")
      val lowered = v.asInstanceOf[UTF8String].toLowerCase.toString
      val sb = new java.lang.StringBuilder(lowered.length)
      var ci = 0
      while (ci < lowered.length) {
        val c = lowered.charAt(ci)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
        ci += 1
      }
      val m = sb.length - (k - 1) // k-gram count
      if (m < 1) return empty
      val h = new Array[Long](m)
      var i = 0
      while (i < m) {
        var acc = sb.charAt(i).toLong
        var j = 1
        while (j < k) { acc = acc * 31L + sb.charAt(i + j).toLong; j += 1 }
        h(i) = acc
        i += 1
      }
      val mins =
        if (m >= w) {
          val nw = m - w + 1
          val out = new Array[Long](nw)
          var j = 0
          while (j < nw) {
            var mn = h(j)
            var t = 1
            while (t < w) { if (h(j + t) < mn) mn = h(j + t); t += 1 }
            out(j) = mn
            j += 1
          }
          out
        } else {
          var mn = h(0)
          var t = 1
          while (t < m) { if (h(t) < mn) mn = h(t); t += 1 }
          Array(mn)
        }
      java.util.Arrays.sort(mins)
      // in-place dedup of the sorted minima
      var w2 = 0
      var r = 0
      while (r < mins.length) {
        if (r == 0 || mins(r) != mins(r - 1)) { mins(w2) = mins(r); w2 += 1 }
        r += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(mins, w2))
    }
    override protected def withNewChildInternal(c: Expression): WinnowFps = copy(child = c)
  }

  import org.apache.spark.sql.classic.GraftBridge

  def array_jaccard(a: Column, b: Column): Column =
    GraftBridge.column(ArrayJaccard(GraftBridge.expression(a), GraftBridge.expression(b)))

  def gunzip(data: Column): Column =
    GraftBridge.column(Gunzip(GraftBridge.expression(data)))

  /** [[gunzip]] with an explicit decompressed-size cap (tests; callers
    * with a tighter payload contract than the 256 MiB default). */
  def gunzip(data: Column, maxBytes: Long): Column =
    GraftBridge.column(Gunzip(GraftBridge.expression(data), maxBytes))

  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def word_shingles(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))

  def char_shingles(text: Column, n: Int): Column =
    GraftBridge.column(CharShingles(GraftBridge.expression(text), n))

  def hyperplane_lsh(vec: Column, nBits: Int, seed: Long = 42L): Column =
    GraftBridge.column(HyperplaneLsh(GraftBridge.expression(vec), nBits, seed))

  def minhash_sig(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingles), k))

  def nearest_centroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec), centroids))

  def simhash64(shingles: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(shingles)))

  def winnow_fps(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFps(GraftBridge.expression(text), k, w))
}
