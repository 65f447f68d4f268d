package graft.queries

/** DuckDB-SQL generator reproducing `HashExprs.HyperplaneLsh` (splitmix64
  * sign hyperplanes) and the full [[graft.sim.Similarity.lshKnn]] pipeline
  * BIT-EXACTLY — the upgrade that moves `s_knn_lsh` off the justified
  * rows-only list. Same mod-2^64 HUGEINT technique as [[XxhashOracleSql]]
  * (wrapping multiply = 32-bit-halves school multiply; unsigned shift =
  * divide by a power of two), but splitmix64 is a 3-step scramble, so the
  * whole sign matrix is a plain vectorized projection chain — no lambdas,
  * no let-bindings.
  *
  * FP determinism: every double reduction (hyperplane projection, dot,
  * norm) is a `list_sum(list_transform(range(1,65), …))` — DuckDB folds
  * the list left-to-right in index order, the same sequence as the
  * expressions' d=0..63 accumulation loops, so the doubles are
  * bit-identical and the rank window (ORDER BY cosine DESC, id) agrees
  * on every comparison (proven convention: the green `s_knn_brute`
  * oracle).
  *
  * nBits sizing: both engines derive nBits = clamp(floor(log2(n/32)),
  * 4, 20) from the EXACT row count — integer bit-length arithmetic on
  * the Spark side, a max-over-powers-of-two subquery here; no FP log
  * whose last-ulp could flip the floor at n = 32·2^k. (The Catalyst
  * plan-stats estimate `Similarity.approxRowCount` remains the sizing
  * path for callers that cannot afford a count job — it is inherently
  * environment-dependent and thus not oracle-able.)
  *
  * Validated end-to-end against an independent sequential-float
  * reimplementation of the lshKnn pipeline at sf0.001 and sf0.01 —
  * exact, including the unrounded cosine rank order.
  */
private[graft] object HyperplaneOracleSql {

  private val M = BigInt(1) << 64
  private val GOLD = BigInt("11400714819323198485") // 0x9E3779B97F4A7C15
  private val INCC = BigInt("13787848793156543929") // 0xBF58476D1CE4E5B9
  private val FIN3 = BigInt("10723151780598845931") // 0x94D049BB133111EB

  /** (a * c) mod 2^64 for a column operand (referenced three times). */
  private def mulcCol(a: String, c: BigInt): String = {
    val cl = c % (BigInt(1) << 32); val ch = c >> 32
    s"((($a%4294967296)*$cl::HUGEINT + ((($a//4294967296)*$cl::HUGEINT" +
      s" + ($a%4294967296)*$ch::HUGEINT)%4294967296)*4294967296)%$M)"
  }

  /** The complete `s_knn_lsh` oracle, mirroring
    * `Similarity.lshKnn(k=5, dim=64, nBits=count-derived, tables=4,
    * seed=42)`: splitmix64 ±1 sign matrix per (table, bit, dim) →
    * per-vector hyperplane-sign buckets → query probes = own bucket +
    * every 1-bit flip → OR-amplified candidate join over (table, bucket)
    * → exact cosine on candidates, distinct, top-5 per query.
    */
  def knnLshSql: String = {
    val dotVQ = "list_sum(list_transform(range(1,65), i -> cv.v[i] * qv.v[i]))"
    val dotVV = "list_sum(list_transform(range(1,65), i -> cv.v[i] * cv.v[i]))"
    val dotQQ = "list_sum(list_transform(range(1,65), i -> qv.v[i] * qv.v[i]))"
    s"""WITH params AS (
       |  SELECT least(20, greatest(4, coalesce((
       |    SELECT max(p)::INT FROM range(0,62) tp(p)
       |    WHERE (1::BIGINT << CAST(p AS INTEGER)) <= (SELECT count(*) FROM embeddings) // 32), 0))) AS nbits),
       |sgn AS (
       |  SELECT t, b, list(CASE WHEN xor(z2, z2//2147483648::HUGEINT) % 2 = 0 THEN 1.0 ELSE -1.0 END ORDER BY d) AS sv
       |  FROM (
       |   SELECT t, b, d, ${mulcCol("zx1", FIN3)} AS z2 FROM (
       |    SELECT t, b, d, xor(z1, z1//134217728::HUGEINT) AS zx1 FROM (
       |     SELECT t, b, d, ${mulcCol("zx0", INCC)} AS z1 FROM (
       |      SELECT t, b, d, xor(z0, z0//1073741824::HUGEINT) AS zx0 FROM (
       |       SELECT tt.range AS t, bb.range AS b, dd.range AS d,
       |         ((42::HUGEINT + tt.range::HUGEINT*7919::HUGEINT) + bb.range::HUGEINT*$GOLD::HUGEINT + dd.range::HUGEINT*$INCC::HUGEINT) % $M::HUGEINT AS z0
       |       FROM range(0,4) tt, range(0,20) bb, range(0,64) dd
       |       WHERE bb.range < (SELECT nbits FROM params))))))
       |  GROUP BY t, b),
       |vecs AS (
       |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |pj AS (
       |  SELECT v.id, s.t, s.b,
       |    list_sum(list_transform(range(1,65), i -> v.v[i] * s.sv[i])) AS proj
       |  FROM vecs v CROSS JOIN sgn s),
       |cb AS (
       |  SELECT id, t, CAST(sum(CASE WHEN proj >= 0 THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0::BIGINT END) AS BIGINT) AS bucket
       |  FROM pj GROUP BY id, t),
       |pr AS (
       |  SELECT c.id AS qid, c.t,
       |    CASE WHEN ff.f = -1 THEN c.bucket
       |         ELSE xor(c.bucket, (1::BIGINT << CAST(ff.f AS INTEGER))) END AS bucket
       |  FROM cb c, range(-1, 20) ff(f)
       |  WHERE c.id < 3 AND ff.f < (SELECT nbits FROM params)),
       |cand AS (
       |  SELECT DISTINCT p.qid, c.id
       |  FROM cb c JOIN pr p ON c.t = p.t AND c.bucket = p.bucket),
       |sc AS (
       |  SELECT cand.qid, cand.id,
       |    $dotVQ / (sqrt($dotVV) * sqrt($dotQQ)) AS cosine
       |  FROM cand JOIN vecs cv ON cand.id = cv.id JOIN vecs qv ON cand.qid = qv.id),
       |ranked AS (
       |  SELECT qid, id, round(cosine, 6) AS cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, id) AS rank
       |  FROM sc
       |  WHERE cosine IS NOT NULL AND NOT isnan(cosine) AND isfinite(cosine))
       |SELECT qid, id, cos, rank FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  /** The `s_rand_proj` oracle, mirroring
    * `Similarity.randomProject(dim=64, outDim=B, seed=42)`: the same
    * splitmix64 ±1 sign chain as [[knnLshSql]]'s `sgn` CTE (seed term
    * without the per-table 7919 offset), each projection folded in
    * d-order by `list_sum(list_transform(...))` — the proven order-exact
    * mirror of the native VecDot loop — then divided by √B (exact for
    * power-of-4 B) and pivoted to y0..y(B-1) columns.
    */
  def randProjSql(outDim: Int): String = {
    val cols = (0 until outDim).map(b =>
      s"CAST(round(max(CASE WHEN b = $b THEN y END), 6) AS DOUBLE) AS y$b")
      .mkString(",\n  ")
    s"""WITH sgn AS (
       |  SELECT b, list(CASE WHEN xor(z2, z2//2147483648::HUGEINT) % 2 = 0 THEN 1.0 ELSE -1.0 END ORDER BY d) AS sv
       |  FROM (
       |   SELECT b, d, ${mulcCol("zx1", FIN3)} AS z2 FROM (
       |    SELECT b, d, xor(z1, z1//134217728::HUGEINT) AS zx1 FROM (
       |     SELECT b, d, ${mulcCol("zx0", INCC)} AS z1 FROM (
       |      SELECT b, d, xor(z0, z0//1073741824::HUGEINT) AS zx0 FROM (
       |       SELECT bb.range AS b, dd.range AS d,
       |         (42::HUGEINT + bb.range::HUGEINT*$GOLD::HUGEINT + dd.range::HUGEINT*$INCC::HUGEINT) % $M::HUGEINT AS z0
       |       FROM range(0,$outDim) bb, range(0,64) dd)))))
       |  GROUP BY b),
       |vecs AS (
       |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |pj AS (
       |  SELECT v.id, s.b,
       |    list_sum(list_transform(range(1,65), i -> v.v[i] * s.sv[i])) / sqrt(CAST($outDim AS DOUBLE)) AS y
       |  FROM vecs v CROSS JOIN sgn s)
       |SELECT id AS vec_id,
       |  $cols
       |FROM pj GROUP BY id ORDER BY vec_id""".stripMargin
  }
}
