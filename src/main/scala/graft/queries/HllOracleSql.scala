package graft.queries

/** DuckDB-SQL generator reproducing Spark's `approx_count_distinct`
  * (HyperLogLog++, Heule et al. 2013, "HyperLogLog in Practice") — the
  * estimator that kept `q_approx_distinct` a justified no-oracle row:
  * the estimate is a function of engine-internal registers. It is also,
  * however, a DETERMINISTIC function of xxhash64 values this codebase
  * already reproduces bit-exactly in SQL (XxhashOracleSql), so the
  * registers — and the whole estimator — can be rebuilt in DuckDB:
  *
  *  1. per-value hash: XxHash64Function.hash(v, LongType, seed=42)
  *     ([[XxhashOracleSql.xxh64LongSql]]);
  *  2. register index = hash >>> (64−p); rho = clz((hash << p) |
  *     (1 << (p−1))) + 1; register = max(rho) per index
  *     (HyperLogLogPlusPlusHelper.update — semantics confirmed from the
  *     shipped bytecode, javap of spark-catalyst 4.1.2);
  *  3. raw estimate E = αm² / Σ 2^−M[i], the Σ a LEFT fold in register
  *     index order (list_sum over an idx-ordered list folds the same
  *     way — the established FP-reduction parity rule); each term
  *     1/2^reg is an exact power of two via integer shift, not pow();
  *  4. linear counting when V (zero registers) > 0 and
  *     (H ≤ THRESHOLDS(p−4) or E ≤ 2.5m), H = m·ln(m/V);
  *  5. bias correction when E < 5m: E − estimateBias(E), the bias the
  *     mean of the K=6 BIAS_DATA neighbours found by binary search +
  *     the distance-improving slide over RAW_ESTIMATE_DATA — the slide
  *     reproduced as a bounded list_reduce;
  *  6. Math.round(est) ≡ FLOOR(est + 0.5) (positive domain).
  *
  * EVERY constant — p, m, αm², the wPadding, THRESHOLDS, and the
  * p-specific RAW_ESTIMATE_DATA / BIAS_DATA rows — is read
  * REFLECTIVELY from Spark's own HyperLogLogPlusPlusHelper at
  * SQL-generation time, so the oracle cannot drift from the engine
  * under test and carries no hand-copied table. Doubles are embedded
  * as '<shortest-roundtrip>'::DOUBLE string parses (correctly rounded
  * on both sides).
  *
  * Residual FP caveat: ln() is the one transcendental on the linear-
  * counting path; Java Math.log and DuckDB ln may differ in the last
  * ulp. The result rounds to an integer estimate in the hundreds-to-
  * tens-of-thousands, so a flip needs the true value within ~1e-12 of
  * a .5 boundary — measure-zero, and the gate would catch it loudly.
  */
private[graft] object HllOracleSql {

  private val M128 = BigInt(1) << 64

  /** Shortest-roundtrip double literal, parsed (correctly rounded) on
    * the DuckDB side; the string form keeps it out of DuckDB's DECIMAL
    * literal typing. */
  private def d(x: Double): String = s"'${x.toString}'::DOUBLE"

  def approxDistinctSql: String = {
    // --- reflect the engine's own constants (rsd 0.02 = the gate's) ---
    val cls = Class.forName(
      "org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper")
    val helper = cls.getConstructor(classOf[Double])
      .newInstance(Double.box(0.02)).asInstanceOf[AnyRef]
    def fld(n: String): AnyRef = {
      val f = cls.getDeclaredField(n); f.setAccessible(true); f.get(helper)
    }
    val p = fld("org$apache$spark$sql$catalyst$util$HyperLogLogPlusPlusHelper$$p")
      .asInstanceOf[Int]
    val m = fld("org$apache$spark$sql$catalyst$util$HyperLogLogPlusPlusHelper$$m")
      .asInstanceOf[Int]
    val idxShift = fld("idxShift").asInstanceOf[Int]
    val wPadding = fld("wPadding").asInstanceOf[Long]
    val alphaM2 = fld("alphaM2").asInstanceOf[Double]
    val compCls = Class.forName(
      "org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper$")
    val comp = compCls.getField("MODULE$").get(null)
    def stat[T](n: String): T = compCls.getMethod(n).invoke(comp).asInstanceOf[T]
    val thr = stat[Array[Double]]("THRESHOLDS")(p - 4)
    val raw = stat[Array[Array[Double]]]("RAW_ESTIMATE_DATA")(p - 4)
    val bias = stat[Array[Array[Double]]]("BIAS_DATA")(p - 4)
    val k = stat[Integer]("K").intValue
    require(p < 19, s"p=$p >= 19 would change the estimator paths")
    require(raw.length == bias.length, "bias tables length mismatch")
    val len = raw.length

    val rawList = raw.map(d).mkString("[", ", ", "]")
    val biasList = bias.map(d).mkString("[", ", ", "]")
    // 2^b, b = 0..63, as HUGEINT literals (bit_length scan; DuckDB has
    // no clz and '<<' on HUGEINT is not portable across versions)
    val pow2 = (0 to 63).map(b => (BigInt(1) << b).toString)
      .mkString("[", "::HUGEINT, ", "::HUGEINT]")

    // the distance-improving slide of estimateBias: start at
    // [max(ins-K+1, 0), min(low+K, len)) and advance while the incoming
    // right neighbour is strictly closer than the outgoing left one
    val slide =
      s"""list_reduce(list_prepend([greatest(ins - ${k - 1}, 0), least(greatest(ins - ${k - 1}, 0) + $k, $len)],
         |        list_transform(range(0, $len), x -> [0::BIGINT, 0::BIGINT])),
         |      (ac, el) -> CASE WHEN ac[2] < $len
         |          AND (rawt[CAST(ac[2] + 1 AS INTEGER)] - e) * (rawt[CAST(ac[2] + 1 AS INTEGER)] - e)
         |            < (rawt[CAST(ac[1] + 1 AS INTEGER)] - e) * (rawt[CAST(ac[1] + 1 AS INTEGER)] - e)
         |        THEN [ac[1] + 1, ac[2] + 1] ELSE ac END)""".stripMargin

    s"""WITH hs AS (
       |  SELECT DISTINCT l_returnflag,
       |    ${XxhashOracleSql.xxh64LongSql("l_partkey")} AS h
       |  FROM lineitem WHERE l_partkey IS NOT NULL),
       |rg AS (
       |  SELECT l_returnflag,
       |    CAST(h // ${(BigInt(1) << idxShift).toString} AS BIGINT) AS idx,
       |    (h * ${(BigInt(1) << p).toString})%$M128 + $wPadding AS w
       |  FROM hs),
       |rho AS (
       |  SELECT l_returnflag, idx,
       |    65 - list_sum(list_transform(range(0, 64),
       |      b -> CASE WHEN w >= ($pow2)[CAST(b + 1 AS INTEGER)]
       |           THEN 1 ELSE 0 END)) AS rho
       |  FROM rg),
       |regs AS (
       |  SELECT l_returnflag, idx, max(rho) AS reg FROM rho GROUP BY 1, 2),
       |grp AS (SELECT DISTINCT l_returnflag FROM lineitem),
       |filled AS (
       |  SELECT g.l_returnflag, i.idx, coalesce(r.reg, 0) AS reg
       |  FROM grp g
       |  CROSS JOIN (SELECT unnest(range(0, $m)) AS idx) i
       |  LEFT JOIN regs r
       |    ON r.l_returnflag IS NOT DISTINCT FROM g.l_returnflag
       |    AND r.idx = i.idx),
       |ag AS (
       |  SELECT l_returnflag,
       |    list_sum(list_transform(list(reg ORDER BY idx),
       |      x -> 1.0 / CAST(1::BIGINT << CAST(x AS INTEGER) AS DOUBLE)))
       |      AS zinv,
       |    CAST(count(CASE WHEN reg = 0 THEN 1 END) AS DOUBLE) AS v
       |  FROM filled GROUP BY 1),
       |est AS (
       |  SELECT l_returnflag, v, ${d(alphaM2)} / zinv AS e,
       |    $rawList AS rawt
       |  FROM ag),
       |lin AS (
       |  SELECT l_returnflag, v, e, rawt,
       |    CASE WHEN v > 0
       |      THEN ${d(m.toDouble)} * ln(${d(m.toDouble)} / v) END AS lc,
       |    len(list_filter(rawt, x -> x < e)) AS ins
       |  FROM est),
       |win AS (
       |  SELECT l_returnflag, v, e, lc,
       |    $slide AS w2
       |  FROM lin),
       |bv AS (
       |  SELECT l_returnflag, v, e, lc,
       |    list_sum(($biasList)[CAST(w2[1] + 1 AS INTEGER):CAST(w2[2] AS INTEGER)])
       |      / CAST(w2[2] - w2[1] AS DOUBLE) AS eb
       |  FROM win),
       |sel AS (
       |  SELECT l_returnflag,
       |    CASE WHEN v > 0 AND (lc <= ${d(thr)} OR e <= ${d(2.5 * m)})
       |           THEN lc
       |         WHEN e < ${d(5.0 * m)} THEN e - eb
       |         ELSE e END AS est
       |  FROM bv)
       |SELECT l_returnflag,
       |  CAST(FLOOR(est + 0.5) AS BIGINT) AS approx_parts
       |FROM sel ORDER BY l_returnflag""".stripMargin
  }
}
