package graft

import graft.queries.{CorpusQueries, LlmQueries, MorphlineQueries, RelationalQueries}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for SparkEntry: the three query modules merge
  * with `++`, so name collisions would silently drop queries; every oracle
  * must refer to a real query; the rows-only set must be the known,
  * justified set (COVERAGE.md) and never grow by accident.
  */
class EntryContractSpec extends AnyFunSuite {

  test("query names are disjoint across modules") {
    val sets = Seq(MorphlineQueries.queries.keySet,
      RelationalQueries.queries.keySet, LlmQueries.queries.keySet,
      CorpusQueries.queries.keySet)
    val collisions = sets.combinations(2).flatMap { case Seq(a, b) => a & b }.toSet
    assert(collisions.isEmpty, s"colliding names: $collisions")
    assert(SparkEntry.queries.size == sets.map(_.size).sum)
  }

  test("every oracle key names an existing query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("rows-only queries are exactly the documented justified set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val justified = Set.empty[String]
      // m_generate_uuid: UPGRADED in round 15 — the hashed output is the
      // deterministic per-record projection (event_id, version nibble,
      // length) under a full DuckDB oracle; the random uuid bits are
      // certified by the query's own fail-fast pass (RFC-4122 v4 format
      // AND global uniqueness, throw on violation). Same certified-output
      // pattern as the sketch gates below.
      // d_minhash_pairs + d_simhash_pairs: UPGRADED to hash oracles in
      // round 11 — XXH64 reproduced in DuckDB SQL (XxhashOracleSql).
      // s_knn_lsh: UPGRADED in round 11 — splitmix64 hyperplanes in SQL
      // (HyperplaneOracleSql) once nBits moved from Catalyst plan stats
      // (environment-dependent) to the exact row count.
      // q_approx_distinct: UPGRADED in round 12 — the HLL++ registers
      // and estimator rebuilt in DuckDB over the reproduced xxhash64,
      // constants reflected from Spark's own helper (HllOracleSql).
      // q_hll_sketch + q_approx_percentile: UPGRADED in round 15 — the
      // hashed output is exact per-group quantities (full DuckDB oracle)
      // and the sketch estimates are certified by enforced fail-fast
      // bounds inside the query (5% relative error for DataSketches HLL;
      // the ±2/accuracy rank interval for Greenwald–Khanna percentiles).
      // Hash-equality of the estimates themselves stays impossible across
      // engines; the bound is the contract.
    assert(rowsOnly == justified,
      s"undocumented rows-only: ${rowsOnly -- justified}; " +
        s"stale justification: ${justified -- rowsOnly}")
  }

  test("generated XXH64 oracles are deterministic across builds") {
    // Verify dumps oracle_sql.json verbatim; a generator that varied
    // between JVM runs (map ordering, counter leakage across builds)
    // would make the dumped SQL differ from the tested SQL.
    assert(graft.queries.XxhashOracleSql.minhashPairsSql ==
      graft.queries.XxhashOracleSql.minhashPairsSql)
    assert(graft.queries.XxhashOracleSql.simhashPairsSql ==
      graft.queries.XxhashOracleSql.simhashPairsSql)
    assert(graft.queries.HyperplaneOracleSql.knnLshSql ==
      graft.queries.HyperplaneOracleSql.knnLshSql)
    assert(graft.queries.HllOracleSql.approxDistinctSql ==
      graft.queries.HllOracleSql.approxDistinctSql)
    assert(graft.queries.HllOracleSql.approxDistinctSql.length < 60000)
    // and they are large but bounded (a blowup here means the let-chain
    // started duplicating operand subtrees textually)
    assert(graft.queries.XxhashOracleSql.minhashPairsSql.length < 60000)
    assert(graft.queries.XxhashOracleSql.simhashPairsSql.length < 60000)
  }

  test("every oracle is plain single-statement SQL (driver runs them verbatim)") {
    // a ';' inside a quoted SQL string literal is data (HTML entities,
    // synthesized scripts), not a statement separator — scan with
    // quote-state so only separators OUTSIDE literals fail
    def outsideLiterals(sql: String): String = {
      val sb = new StringBuilder
      var inQuote = false
      var i = 0
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (c == '\'') inQuote = !inQuote
        else if (!inQuote) sb.append(c)
        i += 1
      }
      sb.toString
    }
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!outsideLiterals(sql).contains(";"),
        s"$name oracle has a statement separator outside string literals")
      assert(sql.trim.toUpperCase.startsWith("SELECT") ||
        sql.trim.toUpperCase.startsWith("WITH"), s"$name oracle is not a query")
    }
  }
}

/** Error/recall bounds for the rows-only approximate queries: the driver's
  * gate can only count their rows, so the accuracy contract is pinned HERE
  * against the exact counterparts (at sf0.01 — big enough that the bounds
  * are not vacuous, small enough for the suite).
  */
class ApproxBoundsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  private val sf = "/root/testdata/sf0.01"
  private def li = Tables.load(spark, sf, "lineitem")

  test("entry() runs against sf0.001 and returns rows (the driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("s_knn_lsh recall against the s_knn_brute ground truth") {
    def pairs(name: String) = graft.queries.LlmQueries.queries(name)(spark, sf)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs("s_knn_brute")
    val lsh = pairs("s_knn_lsh")
    assert(brute.size == 15)
    val recall = (brute & lsh).size.toDouble / brute.size
    // 4 OR-amplified tables, each multi-probed with 1-bit flips: a true
    // neighbour is missed only if EVERY table separates it from the query
    // by ≥2 hyperplanes — the shippable ANN floor
    assert(recall >= 0.8, f"LSH recall $recall%.2f fell below 0.8")
  }

  test("q_kmv_distinct: estimate within the KMV error bound; merge-invariant") {
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kmv = graft.queries.RelationalQueries
      .queries("q_kmv_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kmv.keySet == exact.keySet)
    // k=128 ⇒ relative std error ≈ 1/√(k−2) ≈ 9%; 30% is ≥3σ headroom
    kmv.foreach { case (g, est) =>
      val err = math.abs(est.toDouble - exact(g)) / exact(g)
      assert(err < 0.30, f"group $g: kmv=$est exact=${exact(g)} err=$err%.2f")
    }
    // mergeability: a different partitioning must produce the IDENTICAL
    // estimate (the sketch is a pure function of the k-min hash set)
    import spark.implicits._
    val re = Tables.load(spark, sf, "lineitem").repartition(13)
      .select(col("l_returnflag"),
        graft.pack.Packing.stableDraw(col("l_partkey"), 42).as("hv"))
      .as[(String, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(new graft.exprs.Aggregators.KmvDistinct(128).toColumn
        .name("kmv_distinct"))
      .collect().toMap
    assert(re == kmv)
  }

  test("q_approx_distinct relative error vs exact distinct counts") {
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.queries.RelationalQueries
      .queries("q_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, est) =>
      val err = math.abs(est.toDouble - exact(flag)) / exact(flag)
      // rsd 0.02 requested; 0.1 = 5 sigma, a real-regression detector
      assert(err <= 0.1, f"approx_count_distinct($flag) rel err $err%.3f > 0.1")
    }
  }

  test("q_hll_sketch: hashed output is the exact per-group counts; the " +
      "estimates are certified by the query's own 5% fail-fast guard") {
    // Round 15 moved the estimate bound INSIDE the query (per-group AND
    // unioned-global, throw on >5% relative error), so the query merely
    // COMPLETING certifies the estimator; what it returns — and what the
    // DuckDB oracle hashes — is the exact distinct counts.
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.queries.RelationalQueries.queries("q_hll_sketch")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"exact-count output diverged: $got vs $exact")
  }

  test("q_approx_percentile: rank bound enforced in-query, exact counts out") {
    // Round 15 moved the rank-error certificate INSIDE the query (the
    // estimate's bracketing rank interval must hit the target rank
    // ± 2n/accuracy or the query throws), mirroring an independent GK
    // estimate check here: the raw sketch estimate still lands within a
    // 0.01 relative-rank cushion of each target.
    val counts = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.queries.RelationalQueries
      .queries("q_approx_percentile")(spark, sf) // completing = bound held
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == counts, s"count output diverged: $got vs $counts")
    // independent estimate check, not via the query under test
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)")
        .as("ap"))
      .select(col("l_returnflag"), expr("element_at(ap, 1)").as("p50"),
        expr("element_at(ap, 2)").as("p99"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    approx.foreach { case (flag, p50, p99) =>
      def rankOf(v: Double): Double =
        li.filter(col("l_returnflag") === flag &&
          col("l_extendedprice") <= v).count().toDouble / counts(flag)
      val r50 = rankOf(p50)
      assert(math.abs(r50 - 0.5) <= 0.01,
        f"$flag p50 landed at rank $r50%.4f (want 0.50 +- 0.01)")
      val r99 = rankOf(p99)
      assert(math.abs(r99 - 0.99) <= 0.01,
        f"$flag p99 landed at rank $r99%.4f (want 0.99 +- 0.01)")
    }
  }

  test("m_generate_uuid: certified projection covers every record; the " +
      "format/uniqueness certificate throws on bad generators") {
    import spark.implicits._
    // the gate itself: one deterministic row per event, version '4', len 36
    val got = graft.queries.MorphlineQueries
      .queries("m_generate_uuid")(spark, sf).collect()
    val nEvents = Tables.load(spark, sf, "events").count()
    assert(got.length.toLong == nEvents, "row coverage lost")
    assert(got.forall(r => r.getString(1) == "4" && r.getInt(2) == 36))
    // throw-paths of the extracted certificate (the gate's actual claim)
    def certify(vals: Seq[String]): Unit =
      graft.queries.MorphlineQueries.certifyUuids(vals.toDF("u"), "u")
    val ok = Seq(
      "01234567-89ab-4cde-8f01-23456789abcd",
      "fedcba98-7654-4321-9abc-def012345678")
    certify(ok)                                        // valid v4 set passes
    val dup = intercept[IllegalStateException](certify(ok :+ ok.head))
    assert(dup.getMessage.contains("duplicate"))
    val badVariant = intercept[IllegalStateException](
      certify(Seq("01234567-89ab-4cde-7f01-23456789abcd"))) // variant '7'
    assert(badVariant.getMessage.contains("not RFC-4122"))
    val badVersion = intercept[IllegalStateException](
      certify(Seq("01234567-89ab-5cde-8f01-23456789abcd"))) // version '5'
    assert(badVersion.getMessage.contains("not RFC-4122"))
    val upper = intercept[IllegalStateException](
      certify(Seq("01234567-89AB-4CDE-8F01-23456789ABCD"))) // not canonical
    assert(upper.getMessage.contains("not RFC-4122"))
  }

  test("minhash ∪ simhash candidates cover the exact Jaccard pairs at j>=0.5") {
    val docs = Tables.load(spark, sf, "documents")
    // ground truth: unblocked exact pairs at j>=0.5 (the near-dup regime
    // LSH is designed for; the 0.2-0.5 gray zone is allowed to slip)
    val truth = graft.dedup.Dedup.jaccardPairsExact(
        docs.select(col("doc_id"), col("text")), "text", "doc_id",
        Nil, shingleSize = 3, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "ground truth vacuous at sf0.01 — raise sf")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhash = pairSet(graft.dedup.Dedup.minhashLshPairs(
      docs, "text", "doc_id", shingleSize = 3, numHashes = 16, bands = 4,
      threshold = 0.2))
    val simhash = pairSet(graft.dedup.Dedup.simhashPairs(
      docs, "text", "doc_id", maxHamming = 8))
    val candidates = minhash ++ simhash
    val missed = truth -- candidates
    assert(missed.isEmpty,
      s"near-dup candidates missed ${missed.size}/${truth.size} " +
        s"true pairs at j>=0.5: ${missed.take(5)}")
  }
}
