package graft

import graft.scale.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation") {
    // 90% of rows share one hot key
    val df = (1 to 1000).map(i =>
      (if (i <= 900) "hot" else s"k$i", i.toDouble, i.toLong))
      .toDF("k", "v", "id")
    val direct = df.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
      .as[(String, Double, Long)].collect().map { case (k, s, c) => k -> (s, c) }.toMap
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", 8, $"id")
      .as[(String, Double, Long)].collect().map { case (k, s, c) => k -> (s, c) }.toMap
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val big = (1 to 500).map(i => (if (i % 2 == 0) "hot" else s"k$i", i.toLong))
      .toDF("k", "id")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).select("id", "tag")
      .as[(Long, String)].collect().sorted
    val salted = Skew.saltedJoin(big, small, "k", 4, $"id").select("id", "tag")
      .as[(Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("deterministic salt is retry-stable and bounded") {
    val df = (1 to 100).map(_.toLong).toDF("id")
    val s1 = df.select(Skew.salt(8, $"id").as("s")).as[Int].collect()
    val s2 = df.select(Skew.salt(8, $"id").as("s")).as[Int].collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 8))
  }

  // --- hot-key robustness: the ScaleBench skew-mode shape (one key with
  // ~30% of all rows) must not serialize into one task. For each dedup
  // tier the scale lever is asserted on the PLAN (data-independent), and
  // the answer on a genuinely hot input.

  /** 10k rows, 30% sharing one URL/domain identity (id ≡ 0 mod 91 —
    * the ScaleBench skew-mode construction), the rest diverse. */
  private def hotDocs = {
    val rows = (0L until 10000L).map { i =>
      val id = if (i % 10 < 3) i * 91 else i * 91 + 1 + i % 89
      (id, (id % 500).toInt + 10)
    }
    rows.toDF("doc_id", "n_chars").select(col("doc_id"), col("n_chars"),
      concat(lit("HTTPS://WWW.Example"), (col("doc_id") % 7).cast("string"),
        lit(".COM:443/Page/"), (col("doc_id") % 13).cast("string"),
        lit("?utm_source=x")).as("url"),
      concat(lit("www.example"), (col("doc_id") % 7).cast("string"),
        lit(".com")).as("domain"))
  }

  test("urlDedup under a hot key: map-side group limit prunes before the shuffle") {
    val out = graft.dedup.Dedup.urlDedup(hotDocs, "url", "n_chars", "doc_id")
    val p = out.queryExecution.executedPlan.toString
    // rank-1 prunes to one row per key per map partition BEFORE the
    // exchange — the hot key ships <= numPartitions rows, not 30% of the
    // corpus, so no single reduce task buffers the hot URL
    assert(p.contains("WindowGroupLimit"),
      s"no partial group limit before the url_norm shuffle:\n$p")
    val kept = out.collect()
    // normalizeUrl lowercases the HOST and strips :443/utm; path case stays
    val hot = kept.filter(_.getAs[String]("url_norm").contains("example0.com/Page/0"))
    assert(hot.length == 1, s"hot URL must keep exactly one row, got ${hot.length}")
    // keep-best: the survivor carries the maximum length of the hot group
    val hotMax = hotDocs.filter(col("doc_id") % 91 === 0)
      .agg(max(col("n_chars"))).head().getInt(0)
    assert(hot.head.getAs[Long]("keep_len") == hotMax.toLong)
  }

  test("domainQualityFilter under a hot domain: map-side combine + broadcast join back") {
    val scored = hotDocs.withColumn("q",
      (col("doc_id") % 100).cast("double") / 100.0)
    val out = graft.dedup.Dedup.domainQualityFilter(
      scored, "domain", "q", "doc_id", minMeanQuality = 0.2, minDocs = 5L)
    val p = out.queryExecution.executedPlan.toString
    // the per-domain aggregate is hash-aggregated (partial per map task —
    // the hot domain contributes ONE partial row per task, not 30% of the
    // corpus to one reducer) and the domain verdict joins back broadcast
    assert(p.contains("HashAggregate"), s"domain agg not hash-aggregated:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"domain verdict join-back is not broadcast:\n$p")
    assert(out.count() > 0)
  }

  test("lineDedup under a corpus-hot digest: aggregate streams it, no window buffers it") {
    // 30% of docs are the same single line (the boilerplate shape);
    // canonical pick must be the min (id, idx) occurrence and the plan
    // must carry NO per-key window (a rank-1 window would buffer the hot
    // digest's whole group in one task — the withCrossDocFlag rationale)
    val docs = (0L until 2000L).map { i =>
      val lines = if (i % 10 < 3) Seq("hot boilerplate line")
        else Seq(s"unique line $i a", s"unique line $i b")
      (i, lines)
    }.toDF("id", "lines")
    val out = graft.dedup.Dedup.lineDedup(docs, "lines", "id")
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"lineDedup plans a window — hot digests would serialize:\n$p")
    val rows = out.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("n_removed")).toMap
    // the canonical occurrence is the smallest hot id (0): kept there,
    // removed everywhere else
    assert(rows(0L) == 0L)
    val hotIds = (0L until 2000L).filter(_ % 10 < 3)
    assert(hotIds.tail.forall(rows(_) == 1L),
      "every non-canonical hot line must be removed")
    graft.CacheScope.releaseAll()
  }
}
