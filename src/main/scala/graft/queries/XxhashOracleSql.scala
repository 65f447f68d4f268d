package graft.queries

/** DuckDB-SQL code generator reproducing Spark's `xxhash64` (XXH64,
  * seed 42) BIT-EXACTLY in pure SQL — the piece that historically made
  * every minhash/simhash query "rows-only by construction" ("xxhash64
  * does not exist in DuckDB", tools/ORACLES.md). It does now.
  *
  * Technique: all arithmetic runs on non-negative HUGEINT values in
  * [0, 2^64); a wrapping 64-bit multiply is a 32-bit-halves school
  * multiply mod 2^64 (every intermediate < 2^66 fits HUGEINT, whose
  * overflow would otherwise ERROR in DuckDB, not wrap); rotations are
  * divide/multiply by powers of two; `xor` is DuckDB-native on HUGEINT.
  * Sequencing without macros (oracles must be ONE statement) uses the
  * let-binding idiom `list_transform([e], v -> body)[1]`, so no operand
  * expression is ever duplicated textually and the generated SQL stays
  * linear in the algorithm size (~25 KB).
  *
  * Two per-row-cost tiers, chosen by measurement (round 11):
  *  - variable-length loops (8-byte stripes of a string) use
  *    `list_reduce` folds — lambdas, interpreted, but only evaluated
  *    once per DISTINCT shingle;
  *  - the fixed 4-element hashLong fold for LSH band buckets is
  *    unrolled into chained vectorized projections (44 nested SELECTs,
  *    zero lambdas) — the lambda formulation cost ~300 ms/row in
  *    DuckDB 1.0, the projection chain is negligible.
  *
  * Validated against `pyspark xxhash64` on 22 reference strings
  * covering every tail path (empty, 1..9 bytes, 15, 31..33, 40, 63..65
  * bytes) and against the Spark `d_minhash_pairs` output at sf0.001 and
  * sf0.01 — exact, including the unrounded jaccard doubles.
  */
private[graft] object XxhashOracleSql {

  private val M = BigInt(1) << 64
  private val P1 = BigInt("11400714785074694791") // 0x9E3779B185EBCA87
  private val P2 = BigInt("14029467366897019727") // 0xC2B2AE3D27D4EB4F
  private val P3 = BigInt("1609587929392839161")  // 0x165667B19E3779F9
  private val P4 = BigInt("9650029242287828579")  // 0x85EBCA77C2B2AE63
  private val P5 = BigInt("2870177450012600261")  // 0x27D4EB2F165667C5
  private val GOLD = BigInt("11400714819323198485") // 0x9E3779B97F4A7C15
  private val INCC = BigInt("13787848793156543929") // 0xBF58476D1CE4E5B9
  private val BIAS = BigInt(1) << 63

  /** HashExprs.MinHashSig affine-permutation constants (mod 2^64). */
  private def mult(i: Int): BigInt = (GOLD * (2 * i + 1)) % M
  private def inc(i: Int): BigInt = (INCC * (i + 1)) % M

  /** Fresh-variable counter, reset per [[minhashPairsSql]] build so the
    * generated SQL is deterministic across JVM runs (oracle text equality
    * matters: Verify dumps it verbatim).
    */
  private final class Gen {
    private var cnt = 0
    def fresh(p: String = "v"): String = { cnt += 1; s"$p$cnt" }

    /** let-binding: bind expression `e` to a fresh var inside `body`. */
    def let(e: String)(body: String => String): String = {
      val v = fresh()
      s"list_transform([$e], $v -> ${body(v)})[1]"
    }

    /** (a * c) mod 2^64 — `a` MUST be a cheap expression (var/column
      * ref); it is referenced three times.
      */
    def mulc(a: String, c: BigInt): String = {
      val cl = c % (BigInt(1) << 32); val ch = c >> 32
      s"((($a%4294967296)*$cl::HUGEINT + ((($a//4294967296)*$cl::HUGEINT" +
        s" + ($a%4294967296)*$ch::HUGEINT)%4294967296)*4294967296)%$M)"
    }

    def rotl(a: String, r: Int): String = {
      val lo = BigInt(1) << r; val hi = BigInt(1) << (64 - r)
      s"((($a%$hi)*$lo::HUGEINT + $a//$hi)%$M)"
    }

    def xor(a: String, b: String): String = s"xor($a::HUGEINT, $b::HUGEINT)"

    /** The UTF-8 byte values of VARCHAR expression `s` as an INT list —
      * Spark hashes the raw UTF-8 BYTES, while DuckDB's substr/ord walk
      * CODEPOINTS, so multibyte text (é, CJK, emoji) must be expanded to
      * its encoding explicitly (1–4 bytes per codepoint by range).
      */
    def utf8bytes(s: String): String =
      s"flatten(list_transform(" +
        s"list_filter(string_split($s, ''), ch -> ch <> ''), ch -> " +
        "list_transform([ord(ch)], cp -> CASE " +
        "WHEN cp < 128 THEN [cp] " +
        "WHEN cp < 2048 THEN [192 + cp//64, 128 + cp%64] " +
        "WHEN cp < 65536 THEN [224 + cp//4096, 128 + (cp//64)%64, 128 + cp%64] " +
        "ELSE [240 + cp//262144, 128 + (cp//4096)%64, 128 + (cp//64)%64, " +
        "128 + cp%64] END)[1]))"

    /** Little-endian 8-byte word at word index `wi` (0-based) of byte
      * list `bl`. */
    def word8(bl: String, wi: String): String =
      (0 until 8).map(j =>
        s"$bl[CAST(($wi)*8+${j + 1} AS INTEGER)]::HUGEINT*${BigInt(1) << (8 * j)}::HUGEINT")
        .mkString("(", " + ", ")")

    def int4(bl: String, pos: String): String =
      (0 until 4).map(j =>
        s"$bl[CAST(($pos)+${j + 1} AS INTEGER)]::HUGEINT*${BigInt(1) << (8 * j)}::HUGEINT")
        .mkString("(", " + ", ")")

    /** XXH64 accumulator round: rotl(v + w*P2, 31) * P1. */
    def vround(v: String, w: String): String =
      let(s"($v + ${mulc(w, P2)})%$M")(t => let(rotl(t, 31))(mulc(_, P1)))

    /** Word step: hash ^= rotl(w*P2,31)*P1; hash = rotl(hash,27)*P1+P4. */
    def wordstep(h: String, w: String): String =
      let(mulc(w, P2))(k0 =>
        let(rotl(k0, 31))(k1 =>
          let(mulc(k1, P1))(k2 =>
            let(xor(h, k2))(hx =>
              let(rotl(hx, 27))(hr =>
                s"(${mulc(hr, P1)} + $P4::HUGEINT)%$M")))))

    def bytestep(h: String, b: String): String =
      let(xor(h, mulc(b, P5)))(hx => let(rotl(hx, 11))(mulc(_, P1)))

    def fmix(h: String): String =
      let(xor(h, s"$h//8589934592"))(f1 =>
        let(mulc(f1, P2))(f2 =>
          let(xor(f2, s"$f2//536870912"))(f3 =>
            let(mulc(f3, P3))(f4 =>
              xor(f4, s"$f4//4294967296")))))

    def mergeround(h: String, v: String): String =
      let(mulc(v, P2))(k0 =>
        let(rotl(k0, 31))(k1 =>
          let(mulc(k1, P1))(k2 =>
            let(xor(h, k2))(hx =>
              s"(${mulc(hx, P1)} + $P4::HUGEINT)%$M"))))

    /** Full XxHash64Function.hashUnsafeBytes(s, seed=42) for a VARCHAR
      * expression (any unicode content — hashed over its UTF-8 bytes,
      * exactly like Spark); yields unsigned HUGEINT in [0, 2^64).
      * Matches Spark on every length class: >=32-byte 4-accumulator
      * blocks, trailing 8-byte words, a 4-byte chunk, single bytes.
      */
    def xxh64(sexpr: String, seed: Int = 42): String = {
      let(utf8bytes(sexpr)) { s =>
        let(s"len($s)::BIGINT") { len =>
          val v10 = (seed + P1 + P2) % M
          val v20 = (seed + P2) % M
          val v30 = BigInt(seed) % M
          val v40 = (seed - P1 + M) % M
          val init = s"{'i': -1::BIGINT, 'a': $v10::HUGEINT, 'b': $v20::HUGEINT, " +
            s"'c': $v30::HUGEINT, 'd': $v40::HUGEINT}"
          val blocks = s"list_transform(range(0, $len//32), bx -> " +
            "{'i': bx, 'a': 0::HUGEINT, 'b': 0::HUGEINT, 'c': 0::HUGEINT, 'd': 0::HUGEINT})"
          val acc = s"list_reduce(list_prepend($init, $blocks), (ac, el) -> " +
            s"{'i': 0::BIGINT, " +
            s"'a': ${let(word8(s, "el.i*4+0"))(w => vround("ac.a", w))}, " +
            s"'b': ${let(word8(s, "el.i*4+1"))(w => vround("ac.b", w))}, " +
            s"'c': ${let(word8(s, "el.i*4+2"))(w => vround("ac.c", w))}, " +
            s"'d': ${let(word8(s, "el.i*4+3"))(w => vround("ac.d", w))}})"
          let(acc) { a =>
            val merged =
              let(s"(${rotl(s"$a.a", 1)} + ${rotl(s"$a.b", 7)} + " +
                s"${rotl(s"$a.c", 12)} + ${rotl(s"$a.d", 18)})%$M")(h0 =>
                let(mergeround(h0, s"$a.a"))(h1 =>
                  let(mergeround(h1, s"$a.b"))(h2 =>
                    let(mergeround(h2, s"$a.c"))(h3 =>
                      mergeround(h3, s"$a.d")))))
            val hash0 = s"(CASE WHEN $len >= 32 THEN $merged " +
              s"ELSE ${(seed + P5) % M}::HUGEINT END + $len::HUGEINT)%$M"
            let(hash0) { h0 =>
              val words = s"list_transform(range(($len//32)*4, $len//8), wx -> ${word8(s, "wx")})"
              val hw = s"list_reduce(list_prepend($h0, $words), (hh, ww) -> ${wordstep("hh", "ww")})"
              let(hw) { hwv =>
                val p4off = s"(($len//8)*8)"
                val h4 = s"(CASE WHEN $len - $p4off >= 4 THEN " +
                  let(xor(hwv, mulc(int4(s, p4off), P1)))(hx =>
                    let(rotl(hx, 23))(hr =>
                      s"(${mulc(hr, P2)} + $P3::HUGEINT)%$M")) +
                  s" ELSE $hwv END)"
                let(h4) { h4v =>
                  val bstart = s"($p4off + CASE WHEN $len - $p4off >= 4 THEN 4 ELSE 0 END)"
                  val bts = s"list_transform(range($bstart+1, $len+1), bi -> " +
                    s"$s[CAST(bi AS INTEGER)]::HUGEINT)"
                  val hb = s"list_reduce(list_prepend($h4v, $bts), (hh, bb) -> ${bytestep("hh", "bb")})"
                  let(hb)(fmix)
                }
              }
            }
          }
        }
      }
    }
  }

  private def signedCast(h: String): String =
    s"CAST(CASE WHEN $h >= 9223372036854775808::HUGEINT THEN $h - $M ELSE $h END AS BIGINT)"

  /** Vectorized (column-operand) wrapping multiply — same formula as
    * Gen.mulc but used on plain columns where no let-scope exists.
    */
  private def mulcCol(a: String, c: BigInt): String = {
    val cl = c % (BigInt(1) << 32); val ch = c >> 32
    s"((($a%4294967296)*$cl::HUGEINT + ((($a//4294967296)*$cl::HUGEINT" +
      s" + ($a%4294967296)*$ch::HUGEINT)%4294967296)*4294967296)%$M)"
  }

  private def rotlCol(a: String, r: Int): String = {
    val lo = BigInt(1) << r; val hi = BigInt(1) << (64 - r)
    s"((($a%$hi)*$lo::HUGEINT + $a//$hi)%$M)"
  }

  /** The 4-element hashLong fold (Spark `xxhash64(slice(sig, ...))` over
    * array<long>, seed 42) unrolled into chained vectorized projections
    * over a relation `__bands(doc_id, band, l1..l4)`.
    */
  private def foldChain: String = {
    val keep = "doc_id, band"
    // plain-token substitution, NOT String.format — the SQL is full of
    // literal '%' (mod) characters that Formatter would try to parse
    val PREV = "@PREV@"
    var inner = s"SELECT $keep, l1, l2, l3, l4, 42::HUGEINT AS h FROM __bands"
    for (e <- 1 to 4) {
      val l = s"l$e"
      val steps = Seq(
        s"SELECT $keep, l1, l2, l3, l4, (h + $P5::HUGEINT + 8::HUGEINT)%$M AS h, ${mulcCol(l, P2)} AS k FROM ($PREV)",
        s"SELECT $keep, l1, l2, l3, l4, h, ${rotlCol("k", 31)} AS k FROM ($PREV)",
        s"SELECT $keep, l1, l2, l3, l4, h, ${mulcCol("k", P1)} AS k FROM ($PREV)",
        s"SELECT $keep, l1, l2, l3, l4, xor(h, k) AS h FROM ($PREV)",
        s"SELECT $keep, l1, l2, l3, l4, ${rotlCol("h", 27)} AS h FROM ($PREV)",
        s"SELECT $keep, l1, l2, l3, l4, (${mulcCol("h", P1)} + $P4::HUGEINT)%$M AS h FROM ($PREV)",
        s"SELECT $keep, l1, l2, l3, l4, xor(h, h//8589934592) AS h FROM ($PREV)",
        s"SELECT $keep, l1, l2, l3, l4, ${mulcCol("h", P2)} AS h FROM ($PREV)",
        s"SELECT $keep, l1, l2, l3, l4, xor(h, h//536870912) AS h FROM ($PREV)",
        s"SELECT $keep, l1, l2, l3, l4, ${mulcCol("h", P3)} AS h FROM ($PREV)",
        s"SELECT $keep, l1, l2, l3, l4, xor(h, h//4294967296) AS h FROM ($PREV)")
      steps.foreach(s => inner = s.replace(PREV, inner))
    }
    inner
  }

  /** XXH64 of ONE 8-byte long (Spark `XxHash64Function.hash` for
    * LongType, seed 42 — the HLL++ input hash,
    * HyperLogLogPlusPlusHelper.update) as a let-bound scalar SQL
    * expression over `colExpr`. Any BIGINT is accepted: negatives are
    * rebiased by +2^64 into their unsigned two's-complement value
    * before entering the HUGEINT arithmetic, matching Spark's byte-wise
    * interpretation.
    *
    * hashLong(v, seed): h = seed + P5 + 8; k = rotl(v·P2, 31)·P1;
    * h = rotl(h ⊕ k, 27)·P1 + P4; then the 33/29/32 avalanche — the
    * same per-element step [[minhashPairsSql]]'s band fold chains,
    * here as one scalar expression.
    */
  private[graft] def xxh64LongSql(colExpr: String): String = {
    val g = new Gen
    val h0 = (BigInt(42) + P5 + 8) % M
    // Unconditional +2^64 rebias: a negative BIGINT reinterprets as its
    // unsigned two's-complement value, matching Spark's raw 8-byte hash
    // input (no-op for non-negative keys — closes the silent-divergence
    // path flagged in round-12 ADVICE).
    g.let(s"((($colExpr)::HUGEINT + $M::HUGEINT) % $M::HUGEINT)") { v =>
      g.let(g.mulc(v, P2)) { k0 =>
        g.let(g.rotl(k0, 31)) { k1 =>
          g.let(g.mulc(k1, P1)) { k2 =>
            g.let(g.xor(s"$h0::HUGEINT", k2)) { hx =>
              g.let(g.rotl(hx, 27)) { hr =>
                g.let(s"(${g.mulc(hr, P1)} + $P4::HUGEINT)%$M")(g.fmix)
              }
            }
          }
        }
      }
    }
  }

  /** The complete `d_minhash_pairs` oracle: WordShingles-equivalent
    * 3-gram sets → per-DISTINCT-shingle XXH64 → 16 affine minhash
    * permutations (signed-min via +2^63 bias) → 4 LSH band buckets via
    * hashLong folds → OR-of-bands candidate join (≡ the band-explode
    * join + distinct) → exact-jaccard verification at the same 0.2
    * threshold. Mirrors Dedup.minhashLshPairs(shingleSize=3,
    * numHashes=16, bands=4) constant for constant.
    */
  def minhashPairsSql: String = {
    val g = new Gen
    val toks = "list_filter(string_split(lower(regexp_replace(text, " +
      "'[^\\p{L}\\p{N} ]', ' ', 'g')), ' '), x -> x <> '')"
    val sh = "list_distinct(list_transform(" +
      "range(1, greatest(len(toks) - 1, 2)), " +
      "i -> array_to_string(toks[i:i+2], ' ')))"
    val xxh = g.xxh64("tok")
    val mins = (0 until 16).map(i =>
      s"min((${mulcCol("h", mult(i))} + ${inc(i)}::HUGEINT" +
        s" + $BIAS::HUGEINT)%$M) AS s$i").mkString(", ")
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, " + (0 until 4).map(j =>
        s"(s${4 * b + j} + $BIAS::HUGEINT)%$M AS l${j + 1}").mkString(", ") +
        " FROM sigs").mkString("\n  UNION ALL ")
    val fold = foldChain.replace("__bands", "bands")
    s"""WITH tk AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |shs AS (
       |  SELECT doc_id, $sh AS sh FROM tk WHERE len(toks) > 0),
       |ex AS (
       |  SELECT doc_id, unnest(sh) AS tok FROM shs),
       |dh AS (
       |  SELECT tok, $xxh AS h FROM (SELECT DISTINCT tok FROM ex)),
       |sigs AS (
       |  SELECT doc_id, $mins
       |  FROM ex JOIN dh USING (tok) GROUP BY doc_id),
       |bands AS (
       |  $bandRows),
       |folded AS (
       |  $fold),
       |bk AS (
       |  SELECT f.doc_id,
       |    max(CASE WHEN band = 0 THEN h END) AS b0,
       |    max(CASE WHEN band = 1 THEN h END) AS b1,
       |    max(CASE WHEN band = 2 THEN h END) AS b2,
       |    max(CASE WHEN band = 3 THEN h END) AS b3
       |  FROM folded f GROUP BY f.doc_id),
       |bks AS (
       |  SELECT bk.doc_id, s.sh, bk.b0, bk.b1, bk.b2, bk.b3
       |  FROM bk JOIN shs s USING (doc_id)),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sha, b.sh AS shb
       |  FROM bks a JOIN bks b ON a.doc_id < b.doc_id AND
       |    (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)),
       |ver AS (
       |  SELECT id_a, id_b,
       |    CAST(len(list_intersect(sha, shb)) AS DOUBLE) /
       |    CAST(len(sha) + len(shb) - len(list_intersect(sha, shb)) AS DOUBLE)
       |      AS jaccard
       |  FROM cand)
       |SELECT id_a, id_b, jaccard FROM ver WHERE jaccard >= 0.2
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** The complete `d_simhash_pairs` oracle, mirroring
    * Dedup.simhashPairs(maxHamming = 8): WordShingles 2-grams (NOTE the
    * different range bound — count = len(toks) − 1, not len − 2) →
    * per-DISTINCT-shingle XXH64 → ±1 votes per bit, bit set iff
    * 2·ones > n (ties vote 0, matching `votes(b) > 0`) → a NON-NULL doc
    * with no tokens gets signature 0 (Spark computes SimHash for every
    * non-null row, no size guard — the LEFT JOIN keeps that semantics),
    * while a NULL text gets a NULL signature and so, like Spark's
    * null-propagating expression, never blocks or pairs → 16-bit
    * pigeonhole blocks → OR-of-blocks candidate join → hamming ≤ 8 via
    * per-half bit_count over the xor. All on the unsigned HUGEINT
    * representation; Spark's arithmetic `shiftright` + 0xFFFF mask
    * equals the unsigned divide/mod.
    */
  def simhashPairsSql: String = {
    val g = new Gen
    val toks = "list_filter(string_split(lower(regexp_replace(text, " +
      "'[^\\p{L}\\p{N} ]', ' ', 'g')), ' '), x -> x <> '')"
    val sh = "list_distinct(list_transform(" +
      "range(1, greatest(len(toks), 2)), " +
      "i -> array_to_string(toks[i:i+1], ' ')))"
    val xxh = g.xxh64("tok")
    val ones = (0 until 64).map(b =>
      s"sum((h//${BigInt(1) << b})%2)::BIGINT AS o$b").mkString(", ")
    val sigterms = (0 until 64).map(b =>
      s"(CASE WHEN 2*o$b > n THEN ${BigInt(1) << b}::HUGEINT ELSE 0::HUGEINT END)")
      .mkString(" + ")
    val blocks = (0 until 4).map(i =>
      s"(sig//${BigInt(1) << (16 * i)})%65536 AS blk$i").mkString(", ")
    val ham = "(bit_count(CAST(xor(a.sig//4294967296, b.sig//4294967296) AS BIGINT)) + " +
      "bit_count(CAST(xor(a.sig%4294967296, b.sig%4294967296) AS BIGINT)))"
    s"""WITH tk AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |shs AS (
       |  SELECT doc_id, $sh AS sh FROM tk WHERE len(toks) > 0),
       |ex AS (
       |  SELECT doc_id, unnest(sh) AS tok FROM shs),
       |dh AS (
       |  SELECT tok, $xxh AS h FROM (SELECT DISTINCT tok FROM ex)),
       |vt AS (
       |  SELECT doc_id, count(*) AS n, $ones
       |  FROM ex JOIN dh USING (tok) GROUP BY doc_id),
       |sg0 AS (
       |  SELECT doc_id, ($sigterms) AS sig FROM vt),
       |sigs AS (
       |  SELECT d.doc_id,
       |    CASE WHEN d.text IS NULL THEN NULL
       |         ELSE coalesce(s.sig, 0::HUGEINT) END AS sig
       |  FROM documents d LEFT JOIN sg0 s USING (doc_id)),
       |bk AS (
       |  SELECT doc_id, sig, $blocks FROM sigs),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST($ham AS INTEGER) AS hamming
       |  FROM bk a JOIN bk b ON a.doc_id < b.doc_id AND
       |    (a.blk0 = b.blk0 OR a.blk1 = b.blk1 OR a.blk2 = b.blk2 OR a.blk3 = b.blk3))
       |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 8
       |ORDER BY id_a, id_b""".stripMargin
  }
}
