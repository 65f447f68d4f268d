package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational layer (SURVEY.md §2.E / §7.2 step 8): joins, aggregations,
  * windows, sorts, set ops — absent from the reference, required by the
  * harness and the 100 TB north star.
  *
  * Scale notes per query are inline; common rules:
  *  - dimension tables (region/nation/customer/supplier/part) are broadcast —
  *    no shuffle on the fact side for those joins;
  *  - money aggregates run on DECIMAL (exact, order-independent — safe to
  *    hash-compare) and are cast to double only at the output edge;
  *  - top-k = window row_number + filter, which AQE executes as a partial
  *    top-k per partition, not a global sort of everything.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // try_cast, not cast: the DECIMAL(18,4) parity arithmetic must DEGRADE
  // on an out-of-domain numeric (a corrupt 1e308 price overflow-aborted
  // ten queries under ANSI — relational poisoned-corpus sweep); a NULL
  // term drops the corrupt row from the sum on BOTH engines (the oracles
  // use TRY_CAST identically).
  private def dec(c: String) =
    col(c).try_cast(org.apache.spark.sql.types.DecimalType(18, 4))

  /** Derived deterministic `partsupp` — the testdata ships no partsupp
    * table (TESTDATA.md), so the six remaining TPC-H shapes
    * (Q2/9/11/16/20/21's patterns) run over a pure modular function of
    * part × supplier: each part gets exactly 4 suppliers
    * `(p_partkey·17 + i) mod S` (distinct for i ∈ 0..3 whenever S > 3),
    * an integer supply cost in CENTS (BIGINT — every threshold compare
    * stays integer-exact cross-engine) and an integer availqty. S is the
    * supplier count — a metadata scalar, so the derivation scales with
    * the corpus. The identical definition is the `partsupp AS (…)` CTE
    * in each oracle. 100 TB shape: 4×|part| rows built by a broadcast
    * cross of part with a 4-row local relation — scan-stage, no shuffle.
    */
  private def partsupp(s: SparkSession, dir: String): DataFrame = {
    val sCount = t(s, dir, "supplier").count() // bounded metadata scalar
    val offs = s.range(4).select(col("id").as("i"))
    t(s, dir, "part").select(col("p_partkey"))
      .crossJoin(broadcast(offs))
      .select(col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") * 17 + col("i")) % sCount).as("ps_suppkey"))
      .withColumn("ps_supplycost_cents",
        (col("ps_partkey") * 37 + col("ps_suppkey") * 61) % 90000 + 10000)
      .withColumn("ps_availqty",
        (col("ps_partkey") * 13 + col("ps_suppkey") * 7) % 9999 + 1)
  }

  /** The partsupp CTE mirrored verbatim into every partsupp oracle —
    * one definition, six consumers. */
  private val partsuppCte: String =
    """partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey * 17 + i) % sc AS ps_suppkey,
      |    (p_partkey * 37 + ((p_partkey * 17 + i) % sc) * 61) % 90000
      |      + 10000 AS ps_supplycost_cents,
      |    (p_partkey * 13 + ((p_partkey * 17 + i) % sc) * 7) % 9999
      |      + 1 AS ps_availqty
      |  FROM part
      |  CROSS JOIN (SELECT count(*) AS sc FROM supplier)
      |  CROSS JOIN (VALUES (0), (1), (2), (3)) AS offs(i))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: scan-heavy grouped aggregation with map-side partials.
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"),
          round(sum(dec("l_extendedprice")), 2).cast("double").as("sum_base_price"),
          round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount"))), 2)
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3 shape: two fact joins + grouped top-k by revenue.
    // customer is broadcast; orders⋈lineitem shuffles on the join key once.
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1995-03-15"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .agg(round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount"))), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: star join — every dimension broadcast, one shuffle
    // for the final group-by on n_name.
    "q5_local_supplier" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      val joined = li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
      joined.groupBy(col("n_name"))
        .agg(round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount"))), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q14 shape: conditional aggregation over a broadcast part join.
    "q14_promo_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-09-01") &&
          col("l_shipdate") < lit("1995-10-01"))
      li.join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type").startsWith("PROMO"),
              dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount")))
            .otherwise(lit(0).cast("decimal(18,4)"))), 2).cast("double")
            .as("promo_revenue"),
          round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount"))), 2)
            .cast("double").as("total_revenue"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q7 shape: bi-national volume shipping — the fact joins
    // shuffle once on the order key; supplier/customer/nation (twice,
    // under distinct role aliases) all broadcast. The synthetic nations
    // are uniform, so the filter keeps ALL cross-nation pairs (a named
    // pair is empty at small sf) — same plan shape, adapted selectivity.
    "q7_volume_shipping" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          date_format(col("l_shipdate"), "yyyy").as("l_year"))
        .agg(round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount"))), 2)
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q10 shape: returned-item reporting — one fact shuffle,
    // customer + nation broadcast, top-20 by lost revenue.
    "q10_returned_items" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1996-01-01"))
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("n_name"))
        .agg(round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount"))), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape: large-volume orders — the HAVING subquery is one
    // shuffle on l_orderkey; the filtered aggregate is tiny afterwards,
    // so AQE converts the orders join to broadcast at runtime (the
    // static planner cannot know the post-filter cardinality).
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 200.0)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q4 shape: priority checking — a date-windowed orders scan
    // semi-joined against a filtered lineitem EXISTS probe. The testdata
    // has no l_commitdate/l_receiptdate, so the "late line" predicate is
    // adapted to l_returnflag = 'R' (same plan: selective fact filter →
    // LeftSemi on the order key → tiny grouped count). The semi join
    // shuffles only (l_orderkey) scalars from the probe side.
    "q4_order_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
      val probe = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      ord.join(probe, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q6 shape: forecasting-revenue-change — a pure single-table
    // scan aggregate; every predicate (shipdate range, discount band,
    // quantity cap) pushes to the parquet reader, so at 100 TB this is
    // an embarrassingly parallel scan with map-side partial aggregation
    // and a one-row result. No shuffle beyond the final partial merge.
    "q6_forecast_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
          col("l_quantity") < 24.0)
        .agg(
          round(sum(dec("l_extendedprice") * dec("l_discount")), 2)
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q12 shape: shipping-mode / priority matrix — fact⋈fact join
    // on the order key (one shuffle each side), conditional counts per
    // group. The testdata has no l_shipmode, so the group key is
    // l_linestatus; the high/low split on o_orderpriority is verbatim.
    // count(CASE WHEN … THEN 1 END) rather than sum() keeps both engines
    // on BIGINT (DuckDB's sum(int) returns HUGEINT, which hash-mismatches).
    "q12_priority_lines" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
      val high = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          count(when(high, lit(1))).as("high_line_count"),
          count(when(!high, lit(1))).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // TPC-H Q13 shape: customer order-count distribution. Aggregate the
    // (filtered) orders side FIRST — one shuffle over orders keyed on
    // o_custkey producing a customer-sized count relation — then left
    // join customers so zero-order customers survive with c_count = 0.
    // Joining raw orders to customers and counting after would shuffle
    // the full fact table twice; the agg-then-join plan is the one that
    // holds at 100 TB. The comment filter (no o_comment column) is
    // adapted to o_orderpriority <> '4-NOT SPECIFIED'.
    "q13_customer_orders" -> ((s, dir) => {
      val cnt = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cc"))
      t(s, dir, "customer").select(col("c_custkey"))
        .join(cnt, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("cc"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q19 shape: discounted revenue under a disjunction of
    // (brand, size, quantity) bands. The OR references both sides, so a
    // naive formulation leaves the planner nothing to push; here the
    // single-side implications are pre-extracted — part pre-filtered to
    // the brand/size union, lineitem to the quantity hull [1, 30] — so
    // both scans prune before the broadcast hash join, and the exact
    // disjunction evaluates as the join's residual filter. (No
    // l_shipinstruct/p_container in the testdata; the brand/size/qty
    // bands carry the shape.)
    "q19_discounted_revenue" -> ((s, dir) => {
      val bands = Seq(
        ("Brand#12", 5, 1.0, 11.0),
        ("Brand#23", 10, 10.0, 20.0),
        ("Brand#34", 15, 20.0, 30.0))
      val partSide = bands.map { case (b, sz, _, _) =>
        col("p_brand") === b && col("p_size").between(1, sz) }.reduce(_ || _)
      val liSide = col("l_quantity") >= 1.0 && col("l_quantity") <= 30.0
      val full = bands.map { case (b, sz, lo, hi) =>
        col("p_brand") === b && col("p_size").between(1, sz) &&
          col("l_quantity") >= lo && col("l_quantity") <= hi }.reduce(_ || _)
      t(s, dir, "lineitem").filter(liSide)
        .join(broadcast(t(s, dir, "part").filter(partSide)),
          col("l_partkey") === col("p_partkey") && full)
        .agg(
          round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount"))), 2)
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q22 shape: global sales opportunity — customers above the
    // average positive balance of their cohort with no qualifying
    // orders. Two adaptations to the synthetic data: the country-code
    // substring has no c_phone, so cntrycode is c_nationkey % 7 ∈
    // {0..3}; and every customer has SOME order here, so the anti join
    // is against high-value orders (> 450k) — "never placed a big
    // order" — which keeps the NOT EXISTS non-degenerate at every sf.
    // The scalar "avg" subquery is kept as exact (sum, count) and the
    // threshold test is cross-multiplied (c_acctbal·n > s over DECIMAL)
    // so no engine-ordered double summation ever decides membership —
    // the FP-avg formulation can flip a boundary customer between
    // engines. The one-row stats frame broadcasts; the anti join
    // against orders shuffles only custkeys.
    "q22_global_sales" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .withColumn("cntrycode", (col("c_nationkey") % 7).cast("int"))
        .filter(col("cntrycode") <= 3)
      val stats = cust.filter(col("c_acctbal") > 0.0)
        .agg(sum(dec("c_acctbal")).as("s"), count(lit(1)).as("n"))
      cust
        .join(t(s, dir, "orders")
            .filter(col("o_totalprice") > 450000.0).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(stats))
        // n cast to DECIMAL(12,0) keeps the product at (18,4)×(12,0) =
        // DECIMAL(31,4) — inside precision 38 on BOTH engines, so the
        // comparison is exact decimal arithmetic everywhere (a bare
        // BIGINT operand pushes Spark past 38 → silent scale truncation,
        // while DuckDB falls back to DOUBLE — divergent membership).
        // Headroom: 10^12 qualifying customers per bucket.
        .filter(dec("c_acctbal") * col("n").cast("decimal(12,0)") > col("s"))
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(dec("c_acctbal")), 2).cast("double").as("totacctbal"))
        .orderBy("cntrycode")
    }),

    // TPC-H Q15 shape: top supplier by quarterly revenue — an aggregate
    // relation consumed twice (per-supplier revenue + its scalar max).
    // The revenue relation is cached; the one-row max broadcasts back as
    // a filter. Equality on the rounded-decimal double is exact: both
    // consumers derive it from the SAME exact decimal sum.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = graft.CacheScope.cache(
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1996-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount"))), 2)
            .cast("double").as("total_revenue")))
      val mx = rev.agg(max(col("total_revenue")).as("mr"))
      t(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(mx))
        .filter(col("total_revenue") === col("mr"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 shape: small-quantity-order revenue — the correlated
    // "l_quantity < 0.2 · avg(l_quantity per part)" threshold. The avg
    // is NOT computed as a double (an engine-ordered double summation
    // deciding row membership is the q22 portability trap); the test
    // cross-multiplies to 5·qty·cnt < sum over exact DECIMAL. Brand
    // parts broadcast; the per-part aggregate joins back agg-then-join.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
      // cached: li feeds BOTH the per-part stats aggregate and the final
      // join — uncached, the lineitem scan + broadcast join ran twice
      // (the dominant cost at scale; guide §2.4 shared-subtree rule).
      // Slim by construction: one brand's lineitems, four columns.
      val li = graft.CacheScope.cache(t(s, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), dec("l_quantity").as("l_quantity"),
          dec("l_extendedprice").as("l_extendedprice")))
      val stats = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(dec("l_quantity")).as("qsum"), count(lit(1)).as("qcnt"))
      li.join(stats, col("l_partkey") === col("pk"))
        // operand widths chosen so the triple product stays inside
        // precision 38 on both engines: (18,4)×(2,0)×(12,0) → Spark
        // DECIMAL(34,4), DuckDB DECIMAL(32,4) — exact, no scale
        // truncation (Spark) and no DOUBLE fallback (DuckDB). Headroom:
        // 10^12 lineitems per part before qcnt overflows DECIMAL(12,0).
        .filter(dec("l_quantity") * lit(5).cast("decimal(2,0)") *
          col("qcnt").cast("decimal(12,0)") < col("qsum"))
        .agg(
          // decimal-division scale rules differ between engines; round
          // the exact decimal sum first, then divide identical doubles
          // by the exactly-representable 7.0 — one IEEE op, same bits
          (round(sum(dec("l_extendedprice")), 2).cast("double") / lit(7.0))
            .as("avg_yearly"),
          count(lit(1)).as("n"))
    }),

    // KMV (bottom-k) distinct sketch per group — the MERGEABLE sketch
    // whose estimate is hash-oracle-able: unlike HLL (engine-internal
    // registers ⇒ q_hll_sketch stays rows-only), the KMV estimate is a
    // pure integer function of the k smallest portable md5 hashes, so
    // both engines compute the identical number. The typed Aggregator
    // map-side combines; the shuffle carries ≤ k longs per group.
    "q_kmv_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        // a NULL key has no draw and contributes nothing to the sketch —
        // and the tuple encoder's primitive Long would otherwise throw
        // NOT_NULL_ASSERT_VIOLATION on it (relational poisoned sweep).
        // Filter the SOURCE column, not the computed draw: the predicate
        // pushes to the parquet scan and the md5 draw evaluates once.
        .filter(col("l_partkey").isNotNull)
        .select(col("l_returnflag"),
          graft.pack.Packing.stableDraw(col("l_partkey"), seed = 42).as("hv"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(new graft.exprs.Aggregators.KmvDistinct(128).toColumn
          .name("kmv_distinct"))
        .toDF("l_returnflag", "kmv_distinct")
        .orderBy("l_returnflag")
    }),

    // Window ranking: top-3 orders per customer.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
        .orderBy("o_custkey", "rnk")
    }),

    // Window running aggregate: cumulative spend per customer over time.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_spend",
          round(sum(dec("o_totalprice")).over(w), 2).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Changelog compaction (CDC upsert shape): latest record per key —
    // one digest-keyed shuffle, map-side WindowGroupLimit keeps the top row.
    "q_latest_by_key" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy("user_id")
    }),

    // Time-range window frame: trailing 1-hour spend per user (RANGE frame
    // over event-time millis — the sliding-aggregate capability; the
    // streaming form is windowedCounts with a sliding window).
    "q_window_range" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
        .rangeBetween(-3600000L, Window.currentRow)
      e.withColumn("trailing_1h",
          round(sum(dec("value")).over(w), 2).cast("double"))
        .select(col("event_id"), col("trailing_1h"))
        .orderBy("event_id")
    }),

    // Window lag/lead analytics: day gap between consecutive orders.
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), col("prev_date")).as("gap_days"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Global sort + top-k (AQE turns this into per-partition top-k + merge).
    "q_sort_topk" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(25)),

    // Semi join: customers having at least one order (no row multiplication,
    // no payload from the right side crosses the network).
    "q_semi_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    // Anti join: customers with no orders in the first half of 1995 (the
    // date filter keeps the result non-empty at every sf — every customer
    // has *some* order, so the unfiltered variant compares empty sets).
    "q_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderdate") < lit("1995-07-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    // Set ops: users who both purchased and signed up / purchased only.
    "q_intersect" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.filter(col("event_type") === "purchase").select(col("user_id"))
        .intersect(e.filter(col("event_type") === "signup").select(col("user_id")))
        .orderBy("user_id")
    }),
    // (value threshold keeps both sides selective enough that the difference
    // is non-empty — unfiltered, every purchaser also signed up at sf≥0.01)
    "q_except" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("value") > 245)
      e.filter(col("event_type") === "purchase").select(col("user_id"))
        .except(e.filter(col("event_type") === "signup").select(col("user_id")))
        .orderBy("user_id")
    }),
    "q_union_distinct" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.filter(col("event_type") === "purchase").select(col("user_id"))
        .union(e.filter(col("event_type") === "error").select(col("user_id")))
        .distinct()
        .orderBy("user_id")
    }),

    // Distinct aggregation (exact) + plain counts per group.
    "q_distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // Approx distinct (HLL++) — the scale path for distinct counts at
    // 100 TB. FULL hash oracle since round 12: the estimate is a
    // deterministic function of xxhash64 values the oracle layer
    // reproduces, so HllOracleSql rebuilds registers + estimator in
    // DuckDB with constants reflected from Spark's own helper.
    "q_approx_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy("l_returnflag")),

    // ROLLUP: hierarchical totals (order priority → status).
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(dec("o_totalprice")), 2).cast("double").as("total"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)),

    // CUBE over two lineitem dimensions.
    "q_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // Correlated subquery via spark.sql (Catalyst decorrelates to a join).
    "q_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderkey, o_totalprice
          |FROM orders
          |WHERE (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) >= 5
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // As-of join: for each purchase, the user's most recent prior signup.
    // Spark-first: one shuffle on user_id + ordered window with filtered
    // last() — no self-join, no range explosion (the 100 TB-safe as-of plan).
    "q_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("ts2", date_trunc("second", col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts2"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("last_signup",
          last(when(col("event_type") === "signup", col("ts2")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          col("last_signup").cast("string").as("last_signup"))
        .orderBy("event_id")
    }),

    // Skew-safe salted aggregation (graft.scale.Skew): two-phase partial →
    // final agg over a deterministic salt; exact DECIMAL partials make the
    // reordering oracle-invisible. Same result as the direct group-by.
    "q_salted_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("qty_dec", dec("l_quantity"))
      graft.scale.Skew.saltedSumCount(li, Seq("l_returnflag"), "qty_dec",
          saltN = 8, discriminator = col("l_orderkey"))
        .select(col("l_returnflag"),
          round(col("sum_qty_dec"), 2).cast("double").as("sum_qty"), col("cnt"))
        .orderBy("l_returnflag")
    }),

    // Custom typed Aggregator (§2.F extension surface): exact per-group
    // top-k with a bounded buffer — map-side partials carry ≤k rows per
    // group through the shuffle.
    "q_custom_topk_agg" -> ((s, dir) => {
      import graft.exprs.Aggregators
      import org.apache.spark.sql.functions.udaf
      val topk = udaf(new Aggregators.TopKByValue(3))
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.k").as("o_orderkey"), col("col.v").as("o_totalprice"))
        .orderBy("o_orderpriority", "rnk")
    }),

    // GROUPING SETS via spark.sql.
    "q_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    }),

    // Range (interval) join: event pairs from the same user within 60s.
    // Spark-first scale shape: equi-join on (user, time-bucket) with each
    // left row probing its own and the next bucket — turns an O(n²) theta
    // join into a keyed shuffle join; the |dt|≤60s filter runs post-join.
    "q_range_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts").cast("timestamp")).as("ms"))
      val a = e.withColumn("bucket",
        explode(array(expr("ms div 60000 - 1"), expr("ms div 60000"),
          expr("ms div 60000 + 1"))))
      val b = e.withColumn("bucket", expr("ms div 60000"))
      a.alias("a").join(b.alias("b"),
          col("a.user_id") === col("b.user_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.ms") - col("b.ms")) <= 60000)
        .select(col("a.event_id").as("id_a"), col("b.event_id").as("id_b"))
        .distinct()
        .orderBy("id_a", "id_b")
    }),

    // Session windows (gap-based), batch form: sessions per user with a
    // 30-minute gap rule — the same state shape StreamingOps.sessionCounts
    // maintains incrementally.
    "q_session_count" -> ((s, dir) => {
      val e = t(s, dir, "events")
        // an event without event time cannot be sessionized — excluded
        // EXPLICITLY (the streaming session gates drop it at the
        // watermark; window-lag order would otherwise place it
        // engine-dependently: Spark sorts nulls first, DuckDB last)
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("ts"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      e.withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev").isNull ||
            unix_millis(col("ts").cast("timestamp")) -
              unix_millis(col("prev").cast("timestamp")) > 30 * 60 * 1000, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // Exact percentiles (interpolated) — the quantile capability; the
    // approximate path for 100 TB is q_approx_percentile below.
    "q_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"))
        .orderBy("l_returnflag")),

    // Approximate percentile (Greenwald–Khanna sketch) in its ESTIMATOR
    // regime. The estimates themselves are merge-order-dependent
    // compaction internals — not hashable across engines — so, like
    // q_hll_sketch, the gate is a BOUNDED-ERROR contract (round 15): the
    // returned element's rank interval [count(<v)+1, count(≤v)] must
    // intersect the target rank ±2×n/accuracy (twice the documented
    // 1/accuracy relative rank bound), enforced fail-fast per group and
    // percentile. The hashed output is the per-group counts (full DuckDB
    // oracle); the certificate is the throw-path — an estimator
    // regression turns the cell red instead of passing rows-only.
    "q_approx_percentile" -> ((s, dir) => {
      import s.implicits._
      val accuracy = 1000
      val li = t(s, dir, "lineitem")
      // cached: feeds the probe collect AND the hashed output — 3 rows
      val ap = graft.CacheScope.cache(li.groupBy(col("l_returnflag"))
        .agg(expr(
          s"approx_percentile(l_extendedprice, array(0.5, 0.99), $accuracy)")
          .as("ap"), count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n"),
          expr("element_at(ap, 1)").as("p50"),
          expr("element_at(ap, 2)").as("p99")))
      // returnflag-bounded groups (3) × 2 percentiles — driver-side bounded
      val probes = ap.collect().flatMap(r => Seq(
          (r.getString(0), 0.5, r.getDouble(2), r.getLong(1)),
          (r.getString(0), 0.99, r.getDouble(3), r.getLong(1))))
        .toSeq.toDF("flag", "q", "est", "grp_n")
      // one broadcast pass brackets every estimate's rank in its group
      li.join(broadcast(probes), col("l_returnflag") === col("flag"))
        .groupBy(col("flag"), col("q"), col("grp_n"))
        .agg(
          sum(when(col("l_extendedprice") < col("est"), 1L).otherwise(0L))
            .as("below"),
          sum(when(col("l_extendedprice") <= col("est"), 1L).otherwise(0L))
            .as("at_or_below"))
        .collect().foreach { r =>
          val (flag, q, n) = (r.getString(0), r.getDouble(1), r.getLong(2))
          val (below, atOrBelow) = (r.getLong(3), r.getLong(4))
          val target = q * n
          val eps = math.max(2.0 * n / accuracy, 1.0)
          if (below + 1 > target + eps || atOrBelow < target - eps)
            throw new IllegalStateException(
              s"q_approx_percentile: p$q($flag) rank interval " +
                s"[${below + 1}, $atOrBelow] misses target $target ± $eps " +
                s"(n=$n, accuracy=$accuracy) — estimator regression")
        }
      ap.select(col("l_returnflag"), col("n")).orderBy("l_returnflag")
    }),

    // approx_percentile in its EXACT regime, full hash oracle: with
    // accuracy >= the group row count, QuantileSummaries never compresses
    // (every sample keeps g=1, delta=0), so the sketch holds the exact
    // distribution whatever the merge order and query() returns the
    // element at rank ceil(p*n) — DuckDB's quantile_disc, verified
    // probe-identical across percentiles 0.01..0.99 and under a
    // repartitioned (different merge order) input. This certifies the
    // sketch's exact regime only; the estimator regime (q_approx_percentile
    // above) stays rows-only because KLL compaction is merge-order-
    // dependent. The 10^8 accuracy pin is a MEMORY statement: the state
    // is the group's value multiset, so this variant is for gate scale /
    // bounded groups, not the 100 TB path (that's the sketch regime).
    "q_approx_percentile_exact" -> ((s, dir) => {
      // ENFORCED exact-regime precondition (the fail-fast budget
      // pattern): beyond `accuracy` rows the sketch starts compressing
      // and silently re-enters the merge-order-dependent regime this
      // gate's oracle excludes — and the uncompressed state is the value
      // multiset, so the same bound is the memory statement. One cheap
      // count against the total (>= any group's count) turns both from
      // doc-comment conventions into a throw.
      val accuracy = 100000000L
      val n = t(s, dir, "lineitem").count()
      if (n > accuracy)
        throw new IllegalArgumentException(
          s"q_approx_percentile_exact: $n rows exceed accuracy=$accuracy — " +
            "the no-compression exact regime no longer holds; use the " +
            "sketch-regime q_approx_percentile instead")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr(
          s"approx_percentile(l_extendedprice, array(0.01, 0.5, 0.99), $accuracy)")
          .as("ap"))
        .select(
          col("l_returnflag"),
          expr("element_at(ap, 1)").as("p01"),
          expr("element_at(ap, 2)").as("p50"),
          expr("element_at(ap, 3)").as("p99"))
        .orderBy("l_returnflag")
    }),

    // Statistical moments from exact decimal power sums: mean and sample
    // variance derived as identical double arithmetic on both engines —
    // no dependence on streaming-variance implementation details.
    "q_stats_moments" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(dec("l_quantity")), 2).cast("double").as("s1"),
          round(sum(dec("l_quantity") * dec("l_quantity")), 2).cast("double").as("s2"))
        .select(col("l_returnflag"), col("n"),
          round(col("s1") / col("n"), 6).as("mean"),
          // a single-row group has no sample variance: NULL, not an ANSI
          // DIVIDE_BY_ZERO batch abort on (n-1)=0 (poisoned sweep — any
          // real corpus has singleton groups after a tight filter)
          when(col("n") > 1,
            round((col("s2") - col("s1") * col("s1") / col("n")) /
              (col("n") - 1), 6))
            .as("variance"))
        .orderBy("l_returnflag")),

    // Histogram: fixed-width value binning + counts (the profiling shape).
    "q_histogram" -> ((s, dir) =>
      t(s, dir, "events")
        // An unbinnable measure maps to the explicit NULL bucket. That is
        // (a) non-finite: Spark's floor(double) returns LONG — floor(Inf)
        // saturates to Long.Max and the *50 then ARITHMETIC_OVERFLOW-aborts
        // under ANSI, while floor(NaN) would silently bin at 0; and
        // (b) finite but too large to bin EXACTLY: above ~9e15 (2^53·50/50)
        // Spark's exact long bin arithmetic and the oracle's double-domain
        // floor(v/50)*50 diverge by rounding, and above 9.2e18 the long
        // multiply overflow-aborts (the poison004 1e19..1e308 class, r15
        // ADVICE). abs(value) < 9.0e15 rejects NaN/±Inf too (comparisons
        // with NaN are false), and below it both engines are bit-exact —
        // the guard is mirrored verbatim in the DuckDB oracle.
        .groupBy(when(abs(col("value")) < lit(9.0e15),
            (floor(col("value") / 50) * 50).cast("long")).as("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bin")),

    // Mergeable HLL sketches (Spark 4 datasketches): per-group sketch →
    // union → global estimate — the mergeability is the 100 TB property
    // (partial sketches combine). Hash-equality across engines is
    // impossible (DataSketches HLL is a different algorithm family from
    // DuckDB's or Spark's own HLL++), so the gate is a BOUNDED-ERROR
    // contract instead (round-13 verdict item 4): every per-group
    // estimate AND the unioned global estimate must lie within 5%
    // relative error of the exact distinct count — >3 standard errors at
    // the default lgConfigK=12 (RSE ≈ 0.8326/√4096 ≈ 1.3%), enforced
    // fail-fast like q_approx_percentile_exact's regime guard. The
    // HASHED output is the exact per-group distinct counts (full DuckDB
    // oracle); the sketch's correctness is the throw-path: an estimator
    // regression turns the cell red instead of passing rows-only.
    "q_hll_sketch" -> ((s, dir) => {
      // cached: the grouped sketch+exact relation feeds three consumers
      // (per-group check, union check, hashed output) — group-count-sized
      val both = graft.CacheScope.cache(t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("hll_sketch_agg(l_partkey)").as("sk"),
          countDistinct(col("l_partkey")).as("n_exact")))
      // groups (4) + one union row — driver-side bounded
      val perGroup = both.select(col("l_returnflag"),
        expr("hll_sketch_estimate(sk)").as("est"), col("n_exact")).collect()
      val g = both.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("gest")).head()
      val gExact = t(s, dir, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("n")).head().getLong(0)
      def check(tag: String, est: Long, exact: Long): Unit =
        if (math.abs(est - exact) > 0.05 * exact)
          throw new IllegalStateException(
            s"q_hll_sketch: $tag estimate $est outside 5% of exact $exact " +
              "(>3 standard errors at lgConfigK=12) — estimator regression")
      perGroup.foreach(r =>
        check(r.getString(0), r.getLong(1), r.getLong(2)))
      check("global-union", g.getLong(0), gExact)
      both.select(col("l_returnflag"), col("n_exact"))
        .orderBy("l_returnflag")
    }),

    // Event-time windowed aggregation (batch form of the streaming window;
    // same plan shape as StreamingOps.windowedCounts).
    "q_time_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).cast("string").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(dec("value")), 2).cast("double").as("sum_value"))
        .orderBy("hour", "event_type")),

    // Grouped join aggregate over the events "stream" joined to a dimension:
    // broadcast dimension, single shuffle for the group-by.
    "q_event_enrich" -> ((s, dir) => {
      val users = t(s, dir, "customer")
        .select((col("c_custkey") % 50).as("user_id"), col("c_mktsegment"))
        .groupBy(col("user_id")).agg(min(col("c_mktsegment")).as("segment"))
      t(s, dir, "events")
        .join(broadcast(users), Seq("user_id"), "left")
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), round(sum(dec("value")), 2).cast("double").as("v"))
        .orderBy(col("segment").asc_nulls_first)
    }),

    // Pivot: one row per user, one column per event type. The value list is
    // passed explicitly — without it Spark runs a separate collect-distinct
    // job over the whole fact table before it can even plan, which at 100 TB
    // is a full extra scan. With the list the plan is a single grouped
    // aggregation (map-side partials, one shuffle on user_id).
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum(dec("value")), 2).cast("double"))
        .orderBy("user_id")),

    // Unpivot (wide → long): melt per-flag aggregate metrics into
    // (metric, amount) rows. Spark's unpivot is a zero-shuffle Expand node
    // over the already-aggregated frame — the cheap direction at any scale.
    "q_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(dec("l_quantity")), 2).cast("double").as("qty"),
          round(sum(dec("l_extendedprice")), 2).cast("double").as("price"),
          round(sum(dec("l_discount")), 2).cast("double").as("disc"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc")), "metric", "amount")
        .orderBy("l_returnflag", "metric")
    }),

    // TPC-H Q2 shape: minimum-cost supplier — the correlated scalar
    // subquery over a join (min supplycost within the region, per part).
    // Implemented as ONE pass over the region-filtered partsupp⋈supplier
    // relation with a per-part min window (integer cost ⇒ exact compare);
    // supplier/nation/region broadcast, so the only shuffle is the
    // window's ps_partkey partitioning. LIMIT rides a full deterministic
    // sort key.
    "q2_min_cost_supplier" -> ((s, dir) => {
      // the part filter is part-level and the min is per-part, so pruning
      // parts BEFORE the window is result-identical and cuts the window
      // input by the part selectivity (the oracle windows the unpruned
      // set — same per-part minima)
      val eligible = partsupp(s, dir)
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_size") <= 15 && col("p_type") === "LARGE")),
          col("ps_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
      eligible.withColumn("min_cost",
          min(col("ps_supplycost_cents"))
            .over(Window.partitionBy(col("ps_partkey"))))
        .filter(col("ps_supplycost_cents") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("ps_supplycost_cents"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q9 shape: multi-fact product-profit — lineitem⋈partsupp on
    // the COMPOSITE (partkey, suppkey) key plus part/supplier/nation/
    // orders, aggregated by (nation, year). Profit is computed entirely
    // in exact DECIMAL at cent scale — operand widths (11,4)/(5,4)/(6,4)
    // /(7,0) keep every product inside precision 38 on both engines —
    // and the output is FLOOR(sum) as BIGINT cents (floor of the same
    // exact rational on both engines; ROUND's half-away vs half-up would
    // diverge on negative profits). partsupp is 4×|part| (fact-sized at
    // scale) so the composite-key join shuffles both sides once;
    // part/supplier/nation broadcast; orders shuffles on orderkey.
    "q9_product_profit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_name").like("%ring%")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
      val profit = li
        .join(partsupp(s, dir),
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name"),
          date_format(col("o_orderdate"), "yyyy").as("o_year"),
          (col("l_extendedprice").cast("decimal(11,4)") *
            (lit(100).cast("decimal(3,0)") -
              col("l_discount").cast("decimal(5,4)") *
                lit(100).cast("decimal(3,0)")) -
            col("ps_supplycost_cents").cast("decimal(7,0)") *
              col("l_quantity").cast("decimal(6,4)")).as("amount_cents"))
      profit.groupBy(col("n_name"), col("o_year"))
        .agg(floor(sum(col("amount_cents"))).cast("long").as("profit_cents"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // TPC-H Q11 shape: important-stock — per-part inventory value with a
    // HAVING over a global sum. The fraction threshold is scale-invariant
    // (above the MEAN part value: sum_pk · n_parts > total — TPC-H's
    // 0.0001/SF made the cut scale with the corpus; the mean does the
    // same without a tuning constant) and ENTIRELY integer: value is
    // cents·availqty BIGINT, the compare cross-multiplied BIGINT — no
    // double ever decides membership. One shuffle to group by part; the
    // one-row total broadcasts back.
    "q11_important_stock" -> ((s, dir) => {
      val vals = partsupp(s, dir)
        .join(broadcast(t(s, dir, "supplier")),
          col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_regionkey") === 3)
        .select(col("ps_partkey"),
          (col("ps_supplycost_cents") * col("ps_availqty")).as("v"))
      // cached: perPart feeds BOTH the global total and the membership
      // filter — uncached, the partsupp scan + two broadcast joins + the
      // per-part aggregate ran twice (guide §2.4 shared-subtree rule).
      // Slim: one (partkey, value) row per part.
      val perPart = graft.CacheScope.cache(vals.groupBy(col("ps_partkey"))
        .agg(sum(col("v")).as("value_cents")))
      // overflow headroom at the 100 TB design point (the q17/q22 rule):
      // per-part value is bounded (4 suppliers × cents × availqty
      // < 2×10^10 — BIGINT-safe always), but the GLOBAL total and the
      // cross-multiplied membership product scale with |part| and would
      // silently wrap Spark's non-ANSI Long at |part| ≳ 10^9 while
      // DuckDB keeps them exact in HUGEINT — divergent membership
      // exactly at scale. DECIMAL(28,0) total and a (14,0)×(12,0)
      // product (precision 27) keep both engines exact within 38.
      val tot = perPart.agg(
        sum(col("value_cents").cast("decimal(28,0)")).as("total"),
        count(lit(1)).as("nparts"))
      perPart.join(broadcast(tot))
        .filter(col("value_cents").cast("decimal(14,0)") *
          col("nparts").cast("decimal(12,0)") > col("total"))
        .select(col("ps_partkey"), col("value_cents"))
        .orderBy(col("value_cents").desc, col("ps_partkey"))
    }),

    // TPC-H Q16 shape: parts/supplier relationship count — DISTINCT
    // supplier count per (brand, type, size) bucket after an ANTI join
    // against the excluded-supplier set (negative account balance — the
    // testdata's stand-in for the comment-flagged complaint suppliers).
    // The exclusion set is tiny ⇒ broadcast anti join, no extra shuffle;
    // countDistinct shuffles once on the grouping key.
    "q16_parts_supplier_cnt" -> ((s, dir) => {
      val excluded = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
      partsupp(s, dir)
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 4, 9, 16, 25, 36, 49))),
          col("ps_partkey") === col("p_partkey"))
        .join(broadcast(excluded), col("ps_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q20 shape: potential part promotion — nested SEMI joins:
    // suppliers (region-filtered) semi-joined against partsupp rows whose
    // availqty exceeds half the 1996 shipped quantity of that exact
    // (part, supplier) pair, parts themselves semi-filtered by type. The
    // half-of-sum threshold cross-multiplies in DECIMAL (2·availqty >
    // sum qty — no double membership decision); missing shipment sums
    // coalesce to 0 explicitly on BOTH engines. partsupp⋈shipped joins
    // on the composite key (one shuffle each side); the qualifying
    // supplier-key set is small ⇒ broadcast semi join into supplier.
    "q20_promotion_suppliers" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val shipped = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec("l_quantity")).as("qsum"))
      val qualifying = partsupp(s, dir)
        .join(broadcast(parts), col("ps_partkey") === col("p_partkey"),
          "left_semi")
        .join(shipped,
          col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"), "left")
        .filter(col("ps_availqty").cast("decimal(18,4)") *
          lit(2).cast("decimal(2,0)") >
          coalesce(col("qsum"), lit(0).cast("decimal(18,4)")))
        .select(col("ps_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_regionkey") === 3)
        .join(broadcast(qualifying), col("s_suppkey") === col("ps_suppkey"),
          "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q21 shape: suppliers-who-kept-orders-waiting — the triple
    // lineitem SELF-join: for each 'R'-flagged line of a finished order,
    // EXISTS another supplier's line in the same order (semi join) and
    // NOT EXISTS another supplier's 'R' line (anti join). The testdata
    // ships no commit/receipt dates, so returnflag='R' is the
    // deterministic "late" stand-in — the join topology (the shape under
    // test) is Q21's exactly. Plan regimes (post-exec audit, PLANS.md
    // round 13): up to ~6M-row lineitem the column-pruned
    // (orderkey, suppkey) semi/anti sides compress under the broadcast
    // threshold, so every join is a BroadcastHashJoin and the final
    // groupBy is the ONLY exchange; past the threshold Spark flips them
    // to SMJ on the shared l_orderkey key, where same-key exchange reuse
    // co-locates the three sides. supplier⋈nation stays broadcast.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      val waiting = l1
        .join(l2, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
      waiting
        .join(broadcast(t(s, dir, "supplier")
            .join(broadcast(t(s, dir, "nation")),
              col("s_nationkey") === col("n_nationkey"))
            .filter(col("n_regionkey") === 3)
            .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  strftime(l_shipdate, '%Y') AS l_year,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS revenue
        |FROM lineitem, orders, supplier, customer, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND o_custkey = c_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, n_name,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS revenue
        |FROM lineitem, orders, customer, nation
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING
        |    CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4))), 2) AS DOUBLE) > 200.0)
        |SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)) *
        |           TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= CAST(0.02 AS DOUBLE)
        |  AND l_discount <= CAST(0.04 AS DOUBLE)
        |  AND l_quantity < CAST(24 AS DOUBLE)""".stripMargin,
    "q12_priority_lines" ->
      """SELECT l_linestatus,
        |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |        THEN 1 END) AS high_line_count,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |        THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q13_customer_orders" ->
      """WITH cnt AS (
        |  SELECT o_custkey, count(*) AS cc FROM orders
        |  WHERE o_orderpriority <> '4-NOT SPECIFIED' GROUP BY o_custkey)
        |SELECT c_count, count(*) AS custdist FROM (
        |  SELECT coalesce(cc, CAST(0 AS BIGINT)) AS c_count
        |  FROM customer LEFT JOIN cnt ON c_custkey = o_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q19_discounted_revenue" ->
      """SELECT
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN CAST(1 AS DOUBLE) AND CAST(11 AS DOUBLE))
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN CAST(10 AS DOUBLE) AND CAST(20 AS DOUBLE))
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN CAST(20 AS DOUBLE) AND CAST(30 AS DOUBLE))""".stripMargin,
    "q22_global_sales" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_acctbal,
        |    CAST(c_nationkey % 7 AS INT) AS cntrycode
        |  FROM customer WHERE c_nationkey % 7 <= 3),
        |stats AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS s, count(*) AS n
        |  FROM cust WHERE c_acctbal > CAST(0 AS DOUBLE))
        |SELECT cntrycode, count(*) AS numcust,
        |  CAST(ROUND(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS totacctbal
        |FROM cust, stats
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) * CAST(n AS DECIMAL(12,0)) > s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_totalprice > CAST(450000 AS DOUBLE))
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
    "q_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |    CAST(('0x' || substr(md5('42|' || CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
        |  FROM lineitem WHERE l_partkey IS NOT NULL),
        |r AS (
        |  SELECT l_returnflag, hv,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS nh
        |  FROM h)
        |SELECT l_returnflag,
        |  CAST(CASE WHEN max(nh) < 128 THEN max(nh)
        |       ELSE 127 * 4294967296 //
        |            greatest(max(CASE WHEN rn = 128 THEN hv END), 1)
        |       END AS BIGINT) AS kmv_distinct
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)) *
        |             (CAST(1 AS DECIMAL(18,4)) - TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'),
        |stats AS (
        |  SELECT l_partkey AS pk,
        |    sum(TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4))) AS qsum,
        |    count(*) AS qcnt
        |  FROM li GROUP BY l_partkey)
        |SELECT
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    / CAST(7 AS DOUBLE) AS avg_yearly,
        |  count(*) AS n
        |FROM li JOIN stats ON l_partkey = pk
        |WHERE TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4)) * CAST(5 AS DECIMAL(2,0))
        |      * CAST(qcnt AS DECIMAL(12,0)) < qsum""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(o_totalprice) THEN NULL ELSE o_totalprice END AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
        |    AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT
        |  CAST(ROUND(sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)) *
        |         (CAST(1 AS DECIMAL(18,4)) - TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4)))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS promo_revenue,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4)) *
        |       (CAST(1 AS DECIMAL(18,4)) - TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS total_revenue,
        |  count(*) AS n
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'""".stripMargin,
    "q_latest_by_key" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_window_range" ->
      """SELECT event_id,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(18,4))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_ms(ts)
        |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
        |    AS trailing_1h
        |FROM events ORDER BY event_id""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day',
        |    lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey),
        |    o_orderdate) AS INT) AS gap_days
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_sort_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'signup'
        |ORDER BY user_id""".stripMargin,
    "q_except" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 245
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'signup' AND value > 245
        |ORDER BY user_id""".stripMargin,
    "q_union_distinct" ->
      """SELECT DISTINCT user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |ORDER BY user_id""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // approx_count_distinct, FULL hash oracle (round 12): the HLL++
    // registers and estimator are rebuilt in DuckDB from the xxhash64
    // values XxhashOracleSql already reproduces; every constant is read
    // reflectively from Spark's HyperLogLogPlusPlusHelper at SQL-gen
    // time. See HllOracleSql.
    "q_approx_distinct" -> HllOracleSql.approxDistinctSql,
    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(o_totalprice) THEN NULL ELSE o_totalprice END AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) >= 5
        |ORDER BY o_orderkey""".stripMargin,
    "q_asof_join" ->
      """SELECT p.event_id,
        |  CAST((SELECT max(date_trunc('second', s.ts)) FROM events s
        |        WHERE s.user_id = p.user_id AND s.event_type = 'signup'
        |          AND (date_trunc('second', s.ts) < date_trunc('second', p.ts)
        |               OR (date_trunc('second', s.ts) = date_trunc('second', p.ts)
        |                   AND s.event_id <= p.event_id))) AS VARCHAR) AS last_signup
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_custom_topk_agg" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3
        |ORDER BY o_orderpriority, rnk""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_range_join" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 60000
        |ORDER BY id_a, id_b""".stripMargin,
    "q_session_count" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events WHERE ts IS NOT NULL)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev IS NULL
        |           OR epoch_ms(ts) - epoch_ms(prev) > 1800000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // exact-regime approx_percentile returns the element at rank
    // ceil(p*n) — quantile_disc, not the interpolating quantile_cont
    "q_approx_percentile_exact" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_extendedprice, 0.01) AS p01,
        |  quantile_disc(l_extendedprice, 0.5) AS p50,
        |  quantile_disc(l_extendedprice, 0.99) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // hashed output is the per-group counts; the GK estimates are
    // certified by the query's own rank-interval fail-fast (see the query)
    "q_approx_percentile" ->
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the hashed output is the exact per-group distinct count; the
    // DataSketches estimates are certified by the query's own 5%
    // fail-fast bound (they cannot be hashed across engines — different
    // algorithm family)
    "q_hll_sketch" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_stats_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4))), 2) AS DOUBLE) AS s1,
        |    CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4)) *
        |             TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4))), 2) AS DOUBLE) AS s2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n, round(s1 / n, 6) AS mean,
        |  CASE WHEN n > 1
        |    THEN round((s2 - s1 * s1 / n) / (n - 1), 6) END AS variance
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q_histogram" ->
      """SELECT CASE WHEN abs(value) < 9.0e15
        |  THEN TRY_CAST(floor(value / 50) * 50 AS BIGINT) END AS bin,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_time_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
        |  count(*) AS n,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_event_enrich" ->
      """WITH users AS (
        |  SELECT c_custkey % 50 AS user_id, min(c_mktsegment) AS segment
        |  FROM customer GROUP BY 1)
        |SELECT u.segment, count(*) AS n,
        |  CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(e.value) THEN NULL ELSE e.value END AS DECIMAL(18,4))), 2) AS DOUBLE) AS v
        |FROM events e LEFT JOIN users u USING (user_id)
        |GROUP BY u.segment ORDER BY u.segment NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  CAST(ROUND(sum(CASE WHEN event_type = 'click'
        |    THEN TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS click,
        |  CAST(ROUND(sum(CASE WHEN event_type = 'error'
        |    THEN TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS error,
        |  CAST(ROUND(sum(CASE WHEN event_type = 'purchase'
        |    THEN TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS purchase,
        |  CAST(ROUND(sum(CASE WHEN event_type = 'signup'
        |    THEN TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS signup,
        |  CAST(ROUND(sum(CASE WHEN event_type = 'view'
        |    THEN TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty,
        |    CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4))), 2) AS DOUBLE) AS price,
        |    CAST(ROUND(sum(TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(18,4))), 2) AS DOUBLE) AS disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, amount FROM (
        |  SELECT l_returnflag, 'qty' AS metric, qty AS amount FROM w
        |  UNION ALL SELECT l_returnflag, 'price', price FROM w
        |  UNION ALL SELECT l_returnflag, 'disc', disc FROM w)
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q2_min_cost_supplier" ->
      s"""WITH $partsuppCte,
        |eligible AS (
        |  SELECT ps_partkey, ps_supplycost_cents, s_acctbal, s_name, n_name
        |  FROM partsupp, supplier, nation, region
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |won AS (
        |  SELECT *, min(ps_supplycost_cents)
        |    OVER (PARTITION BY ps_partkey) AS mc
        |  FROM eligible)
        |SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost_cents
        |FROM won JOIN part ON ps_partkey = p_partkey
        |WHERE ps_supplycost_cents = mc
        |  AND p_size <= 15 AND p_type = 'LARGE'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      s"""WITH $partsuppCte
        |SELECT n_name, strftime(o_orderdate, '%Y') AS o_year,
        |  CAST(FLOOR(sum(
        |    CAST(l_extendedprice AS DECIMAL(11,4)) *
        |      (CAST(100 AS DECIMAL(3,0)) -
        |       CAST(l_discount AS DECIMAL(5,4)) * CAST(100 AS DECIMAL(3,0))) -
        |    CAST(ps_supplycost_cents AS DECIMAL(7,0)) *
        |      CAST(l_quantity AS DECIMAL(6,4)))) AS BIGINT) AS profit_cents
        |FROM lineitem, partsupp, part, supplier, nation, orders
        |WHERE l_partkey = p_partkey AND p_name LIKE '%ring%'
        |  AND l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,
    "q11_important_stock" ->
      s"""WITH $partsuppCte,
        |vals AS (
        |  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v
        |  FROM partsupp, supplier, nation
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = 3),
        |per_part AS (
        |  SELECT ps_partkey, sum(v) AS value_cents FROM vals GROUP BY 1),
        |tot AS (
        |  SELECT sum(CAST(value_cents AS DECIMAL(28,0))) AS total,
        |    count(*) AS nparts FROM per_part)
        |SELECT ps_partkey, CAST(value_cents AS BIGINT) AS value_cents
        |FROM per_part, tot
        |WHERE CAST(value_cents AS DECIMAL(14,0))
        |      * CAST(nparts AS DECIMAL(12,0)) > total
        |ORDER BY value_cents DESC, ps_partkey""".stripMargin,
    "q16_parts_supplier_cnt" ->
      s"""WITH $partsuppCte
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp JOIN part ON ps_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM supplier
        |    WHERE s_suppkey = ps_suppkey AND s_acctbal < CAST(0 AS DOUBLE))
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_promotion_suppliers" ->
      s"""WITH $partsuppCte,
        |shipped AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(TRY_CAST(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END AS DECIMAL(18,4))) AS qsum
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1, 2),
        |qualifying AS (
        |  SELECT DISTINCT ps_suppkey FROM partsupp
        |  LEFT JOIN shipped
        |    ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |  WHERE ps_partkey IN (
        |      SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
        |    AND CAST(ps_availqty AS DECIMAL(18,4)) * CAST(2 AS DECIMAL(2,0)) >
        |        coalesce(qsum, CAST(0 AS DECIMAL(18,4))))
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_regionkey = 3
        |  AND s_suppkey IN (SELECT ps_suppkey FROM qualifying)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        |  AND n_regionkey = 3
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin
  )
}
